#!/bin/bash
# Waits for the axon tunnel to recover, then captures the profiling data
# queued for the current perf round.  Outputs under tools/out/.
cd /root/repo
probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
(jnp.ones((1024,1024))@jnp.ones((1024,1024))).block_until_ready()
print('ok')" 2>/dev/null | grep -q ok
}
until probe; do
  echo "$(date +%H:%M:%S) tunnel down" >> tools/out/probe.log
  sleep 60
done
echo "$(date +%H:%M:%S) tunnel UP" >> tools/out/probe.log
set -x
timeout 1200 python tools/profile_levels.py 4096 > tools/out/profile_levels_4096.txt 2>&1
timeout 1200 python tools/profile_interp.py 4096 > tools/out/profile_interp_4096.txt 2>&1
timeout 2400 python tools/bench_all.py > tools/out/bench_all.txt 2>&1
echo DONE >> tools/out/probe.log
