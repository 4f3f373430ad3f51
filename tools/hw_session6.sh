#!/bin/bash
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
while pgrep -f "hw_session[12345].sh\|profile_\|probe_256\|probe_fcycle\|probe_planes" | grep -v $$ >/dev/null; do sleep 20; done
date > $O/hw_session6.log
echo "== probe_256b ==" >> $O/hw_session6.log
timeout 2400 python tools/probe_256b.py >> $O/hw_session6.log 2>&1
echo "== done ==" >> $O/hw_session6.log
date >> $O/hw_session6.log
