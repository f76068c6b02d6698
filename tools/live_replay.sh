#!/usr/bin/env bash
# One-command live-gate replay (RUNBOOK §5): replays every blind-built
# wire semantic against a REAL server in one sitting —
#
#   1. the env-gated integration suite (39 wire shapes as of r17:
#      pipelines, joins incl. ranges, unwinds, regex/dialect parity,
#      foreign-storage probes);
#   2. the FULL oracle-checked catalog over served copies of the
#      TESTDATA tables: graft.ServerSeed loads them, graft.Verify runs
#      every query against `graftserver:<uri>`, tools/check.py evaluates
#      the same SQL over the parquet originals in DuckDB — value parity
#      across the whole catalog.
#
# Usage:
#   tools/live_replay.sh mongodb://host:27017 [sfdir]
#   tools/live_replay.sh --sandbox-smoke          # no server needed
#
# Spin-up (any one of):
#   docker run -d -p 27017:27017 mongo:7          # docker
#   mongod --dbpath /tmp/mdb --port 27017 &       # local binary
# The replay writes into the `graft_it` (suite) and `graft_verify`
# (catalog) databases under run-unique collection names; drop both
# afterwards: mongosh --eval 'db.getSiblingDB("graft_it").dropDatabase();
#                             db.getSiblingDB("graft_verify").dropDatabase()'
#
# The --sandbox-smoke mode proves the argument plumbing end-to-end
# without a server: the suite must CANCEL itself cleanly (exit 0), and
# the seed → Verify → check chain runs against the file-backed sandbox
# transport on the ServerParitySpec-pinned sample plus the r17 range/map
# join shapes.
set -euo pipefail
cd "$(dirname "$0")/.."

SMOKE_QUERIES="q19_dedup_exact q24_text_tokens q81_quality_gate \
q83_split_assign q39_semi_join q07_count_per_key q87_skew_report \
q88_chunk_docs q170_server_interval_join q171_server_asof_join \
q172_server_map_join_topn \
q173_server_computed_bin_join q174_file_computed_bin \
q175_server_year_bin_group q176_file_date_trunc_bin \
q177_server_chained_range_join q178_server_string_range_join \
q179_server_string_topn q180_file_string_topn \
q181_server_string_minmax_group q182_server_hour_dow_bin_group q183_server_trunc_month_group"

if [ "${1:-}" = "--sandbox-smoke" ]; then
  SF=${2:-/root/testdata/sf0.001}
  echo "== [1/3] integration suite without MONGO_URI: must cancel cleanly =="
  sbt -batch "testOnly graft.server.RealMongoIntegrationSpec" \
    | grep -E "Tests: succeeded 0, .* canceled [1-9]" \
    || { echo "suite did not cancel cleanly"; exit 1; }
  DIR=$(mktemp -d /tmp/graft-livesmoke-XXXX)
  OUT=$(mktemp -d /tmp/graft-livesmoke-out-XXXX)
  echo "== [2/3] seed sandbox transport at $DIR =="
  sbt -batch "runMain graft.ServerSeed $SF $DIR" | grep '\[seed\]'
  echo "== [3/3] catalog sample over graftserver:$DIR vs DuckDB on $SF =="
  sbt -batch "runMain graft.Verify graftserver:$DIR $OUT $SMOKE_QUERIES" \
    > /dev/null
  python3 tools/check.py "$SF" "$OUT" $SMOKE_QUERIES
  echo "sandbox smoke OK — plumbing verified without a server"
  exit 0
fi

URI=${1:-${MONGO_URI:-}}
SF=${2:-/root/testdata/sf0.01}
if [ -z "$URI" ]; then
  echo "usage: tools/live_replay.sh mongodb://host:27017 [sfdir]" >&2
  echo "       tools/live_replay.sh --sandbox-smoke [sfdir]" >&2
  exit 2
fi
OUT=$(mktemp -d /tmp/graft-live-verify-XXXX)

echo "== [1/3] env-gated integration suite (39 wire shapes) =="
MONGO_URI="$URI" sbt -batch "testOnly graft.server.RealMongoIntegrationSpec"

echo "== [2/3] seeding TESTDATA tables from $SF into $URI (graft_verify.*) =="
sbt -batch "runMain graft.ServerSeed $SF $URI"

echo "== [3/3] FULL catalog over graftserver:$URI vs DuckDB on $SF =="
sbt -batch "runMain graft.Verify graftserver:$URI $OUT"
python3 tools/check.py "$SF" "$OUT"

echo "live replay complete — drop graft_it and graft_verify when done"
