#!/bin/bash
# Serialized TPU measurement session (one job at a time; the tunnel TPU
# is single-tenant and concurrent clients block each other).
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
date > $O/hw_session1.log
while pgrep -f probe_stream_hw >/dev/null; do sleep 10; done
echo "== profile_cycle3_ops 128 27 ==" >> $O/hw_session1.log
timeout 1500 python tools/profile_cycle3_ops.py 128 27 >> $O/hw_session1.log 2>&1
echo "== probe_stream 256 7pt ==" >> $O/hw_session1.log
timeout 1500 python tools/probe_stream_hw.py 256 >> $O/hw_session1.log 2>&1
echo "== profile_cycle3_ops 256 7pt ==" >> $O/hw_session1.log
timeout 1500 python tools/profile_cycle3_ops.py 256 >> $O/hw_session1.log 2>&1
echo "== done ==" >> $O/hw_session1.log
date >> $O/hw_session1.log
