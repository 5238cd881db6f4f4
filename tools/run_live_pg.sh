#!/bin/bash
# Stand up a REAL local PostgreSQL (wal_level=logical) and run the live
# CDC tests against it — the exercised-service-path gate for the native
# replication client (tests/test_pg_replication.py,
# tests/test_pgoutput.py). Writes the pytest output to
# ARTIFACTS/live_pg_<date>.log for the round artifact.
#
# Requires: postgresql-15 server package, a non-root `postgres` user
# (run as root; su postgres is used for the server-side commands).
# The wal2json test is skipped automatically when the extension is not
# installed (stock container); the pgoutput path needs no extension.
set -euo pipefail

PGBIN=/usr/lib/postgresql/15/bin
DATA=/tmp/dozer_spark_pg
PORT=54329
LOG=/tmp/dozer_spark_pg.log

cleanup() {
    su postgres -s /bin/bash -c "$PGBIN/pg_ctl -D $DATA -m immediate stop" >/dev/null 2>&1 || true
}
trap cleanup EXIT

rm -rf "$DATA"
mkdir -p "$DATA"
chown postgres:postgres "$DATA"

su postgres -s /bin/bash -c "$PGBIN/initdb -D $DATA -U postgres --auth=trust" >/dev/null
cat >> "$DATA/postgresql.conf" <<EOF
wal_level = logical
max_replication_slots = 8
max_wal_senders = 8
listen_addresses = '127.0.0.1'
port = $PORT
EOF
su postgres -s /bin/bash -c "$PGBIN/pg_ctl -D $DATA -l $LOG -w start" >/dev/null

export SPARK_GRAFT_PG_URL="postgres://postgres@127.0.0.1:$PORT/postgres"
mkdir -p "$(dirname "$0")/../ARTIFACTS"
OUT="$(dirname "$0")/../ARTIFACTS/live_pg_$(date +%Y%m%d).log"

echo "== live Postgres $($PGBIN/postgres --version) on port $PORT" | tee "$OUT"
su postgres -s /bin/bash -c "$PGBIN/psql -p $PORT -U postgres -c 'show wal_level'" | tee -a "$OUT"
python -m pytest tests/test_pgoutput.py tests/test_pg_replication.py \
    -q -p no:cacheprovider 2>&1 | tail -20 | tee -a "$OUT"
