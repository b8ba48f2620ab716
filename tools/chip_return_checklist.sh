#!/usr/bin/env bash
# Run the post-outage TPU validation checklist in order, logging to
# /tmp/chip_return.log.  Safe to re-run; each step is individually
# time-bounded.  Written during the 2026-08-18 axon-tunnel outage so the
# on-chip A/B of the round-3 reformulations (decimated jitters, fw row
# gather) runs the moment the tunnel recovers.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_return.log
exec > >(tee -a "$LOG") 2>&1

echo "=== chip_return_checklist $(date) ==="

echo "--- 0. device probe"
timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL STILL DOWN"; exit 1; }

echo "--- 1. per-op A/B probe (jitters, fw warp)"
timeout 900 python -u tools/probe_flag_ops.py

echo "--- 2. TPU-backend resample oracle suite"
GOOFER_TPU_TEST_PLATFORM=tpu timeout 3000 python -m pytest \
  tests/test_resample_oracle.py -q

echo "--- 3. headline bench"
timeout 1200 python bench.py

echo "--- 4. entry() compile check"
timeout 900 python -c "import jax,__graft_entry__; \
fn,a=__graft_entry__.entry(); jax.jit(fn).lower(*a).compile(); print('entry ok')"

echo "--- 5. heavy-graph executable sizes (round-5 IIR scan-carry check)"
timeout 1200 python -u tools/probe_exec_size.py

echo "--- 6. warm-process start (target <=15 s first heavy render)"
timeout 1200 python -u tools/probe_warm_start.py

echo "--- 7. interactive RTT-floor decomposition"
timeout 900 python -u tools/probe_rtt_floor.py

echo "=== checklist done $(date) ==="
