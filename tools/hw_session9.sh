#!/bin/bash
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
while pgrep -f "hw_session[12345678].sh\|profile_\|probe_" | grep -v $$ >/dev/null; do sleep 20; done
date > $O/hw_session9.log
echo "== profile_cycle3_ops 256 ==" >> $O/hw_session9.log
timeout 2400 python tools/profile_cycle3_ops.py 256 >> $O/hw_session9.log 2>&1
echo "== profile_cycle3_ops 128 27 ==" >> $O/hw_session9.log
timeout 1800 python tools/profile_cycle3_ops.py 128 27 >> $O/hw_session9.log 2>&1
echo "== done ==" >> $O/hw_session9.log
date >> $O/hw_session9.log
