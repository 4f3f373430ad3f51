#!/bin/bash
# Second serialized TPU session: waits for session1, then planes + fcycle.
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
while pgrep -f "hw_session1.sh\|profile_cycle3_ops\|probe_stream_hw" | grep -v $$ >/dev/null; do sleep 20; done
date > $O/hw_session2.log
echo "== profile_fcycle 4096 ==" >> $O/hw_session2.log
timeout 1500 python tools/profile_fcycle.py >> $O/hw_session2.log 2>&1
echo "== profile_planes 128 ==" >> $O/hw_session2.log
timeout 1800 python tools/profile_planes.py >> $O/hw_session2.log 2>&1
echo "== f64 probe ==" >> $O/hw_session2.log
timeout 300 python -c "
import jax, jax.numpy as jnp, time
jax.config.update('jax_enable_x64', True)
x = jnp.ones((512, 512), jnp.float64)
t0 = time.time(); y = (x @ x).block_until_ready()
print('f64 matmul ok', y.dtype, f'{time.time()-t0:.1f}s')
z = (x + x * 1e-16).block_until_ready(); print('f64 add ok', z.dtype)
" >> $O/hw_session2.log 2>&1
echo "== done ==" >> $O/hw_session2.log
date >> $O/hw_session2.log
