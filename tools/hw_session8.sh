#!/bin/bash
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
while pgrep -f "hw_session[1234567].sh\|profile_\|probe_256\|probe_fcycle\|probe_planes" | grep -v $$ >/dev/null; do sleep 20; done
date > $O/hw_session8.log
timeout 1800 python tools/probe_planes_pieces.py >> $O/hw_session8.log 2>&1
echo "== done ==" >> $O/hw_session8.log
date >> $O/hw_session8.log
