#!/bin/bash
# Waits for the TPU tunnel to recover from the 2026-08-17 outage, then runs
# the pending hardware benchmark batch (bench.py with the relu-elision +
# bf16-emit serving path that landed after the last chip measurement).
#
# Probe: jax.devices() hangs forever while the relay is down (no listener
# on the tunnel ports), so each probe runs under `timeout` in a fresh
# interpreter.  sitecustomize on this box ignores JAX_* env vars, so the
# default (axon/TPU) backend is what a bare import probes.
set -u
cd /root/repo

probe() {
    timeout 120 python -c '
import jax
ds = jax.devices()
assert ds and ds[0].platform not in ("cpu",), ds
print("platform:", ds[0].platform)
' 2>/dev/null
}

echo "[recovery] probe loop started $(date -u +%H:%M:%S)"
until probe; do
    echo "[recovery] $(date -u +%H:%M:%S) still down"
    sleep 240
done
echo "[recovery] TPU reachable at $(date -u +%H:%M:%S) — running bench.py"

timeout 5400 python bench.py > /tmp/bench_recovered.json 2> /tmp/bench_recovered.err
rc=$?
echo "[recovery] bench.py exit=$rc"
cat /tmp/bench_recovered.json
exit $rc
