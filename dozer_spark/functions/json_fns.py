"""JSON functions: JSON_VALUE / JSON_QUERY.

Reference: dozer-sql/expression/src/json_functions.rs:13-118 with a bundled
JSONPath engine (dozer-sql/jsonpath/). JSON is a scalar type in dozer
(field.rs:900); we map it to StringType and evaluate paths with Spark's
native get_json_object (JVM-side JsonPath — same `$.a.b[0]` dialect).

JSON_VALUE returns a scalar (string form); JSON_QUERY returns the JSON
subtree serialized as JSON text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _norm_path(path: str) -> str:
    """Accept dozer-style paths ('$.a.b', 'a.b', '$[0]') -> JsonPath."""
    if not path.startswith("$"):
        path = "$." + path
    return path


def json_value(c, path: str) -> Column:
    """JSON_VALUE(json, path) — json_functions.rs:13-60. Scalar result."""
    col = c if isinstance(c, Column) else F.col(c)
    return F.get_json_object(col, _norm_path(path))


def json_query(c, path: str = "$") -> Column:
    """JSON_QUERY(json, path) — json_functions.rs:62-118.

    Returns the matched subtree as JSON text (get_json_object already
    serializes non-scalar matches as JSON).
    """
    col = c if isinstance(c, Column) else F.col(c)
    return F.get_json_object(col, _norm_path(path))
