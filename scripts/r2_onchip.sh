#!/usr/bin/env bash
# One-shot on-chip measurement pass for round 2 (run when the axon tunnel
# is healthy).  Each stage under timeout so a wedged tunnel can't hang the
# driver.  PYTHONPATH is APPENDED (never overwritten — drops the plugin).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# 0. probe
timeout 90 python -c "import jax; print(jax.devices())" || exit 1

# 1. library smoke on the real chip
timeout 550 python scripts/smoke_tpu.py 2>&1 | tail -5

# 2. headline bench (v5 kernel + flat3 vblock integrated)
timeout 550 python bench.py

# 3. production-kernel config sweep (chunk, W, G, D)
timeout 580 python scripts/v5_prod_time.py 2>&1 | tail -20

# 4. step-part breakdown
timeout 550 python scripts/profile_parts.py 2>&1 | tail -12
