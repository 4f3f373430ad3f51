#!/bin/bash
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
while pgrep -f "hw_session[12].sh\|profile_fcycle\|profile_planes\|profile_cycle3" | grep -v $$ >/dev/null; do sleep 20; done
date > $O/hw_session3.log
echo "== probe_256_variants ==" >> $O/hw_session3.log
timeout 2400 python tools/probe_256_variants.py 256 >> $O/hw_session3.log 2>&1
echo "== done ==" >> $O/hw_session3.log
date >> $O/hw_session3.log
