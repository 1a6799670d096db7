#!/bin/bash
# Run a TPU tool under the relay's outage semantics: when backend init
# fails ("Unable to initialize backend 'axon': UNAVAILABLE") jax caches the
# dead backend for the process lifetime, so recovery REQUIRES a fresh
# process (NOTES_TPU_ENV.md, "Relay OUTAGE family", 2026-08-18). bench.py
# has this retry baked in; this wrapper gives every other long-running
# tool (soaks, probes) the same behavior.
#
# Usage: tools/relay_retry.sh [-n ATTEMPTS] [-t PER_ATTEMPT_TIMEOUT_S] -- cmd args...
# Exit: the wrapped command's first success, else the last failure code.
set -u

ATTEMPTS=4
TIMEOUT_S=3600
while getopts "n:t:" opt; do
  case "$opt" in
    n) ATTEMPTS="$OPTARG" ;;
    t) TIMEOUT_S="$OPTARG" ;;
    *) echo "usage: $0 [-n attempts] [-t timeout_s] -- cmd args..." >&2; exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ "${1:-}" = "--" ] && shift
[ $# -ge 1 ] || { echo "usage: $0 [-n attempts] [-t timeout_s] -- cmd args..." >&2; exit 2; }

rc=1
for i in $(seq 1 "$ATTEMPTS"); do
  if [ "$i" -gt 1 ]; then
    delay=$((60 * (i - 1)))
    echo "relay_retry: attempt $((i - 1)) failed (rc=$rc); retrying in ${delay}s" >&2
    sleep "$delay"
  fi
  # A wedged init can hang ~35 min before failing; cap each attempt.
  timeout --signal=KILL "$TIMEOUT_S" "$@"
  rc=$?
  [ "$rc" -eq 0 ] && exit 0
done
exit "$rc"
