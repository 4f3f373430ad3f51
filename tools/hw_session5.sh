#!/bin/bash
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
while pgrep -f "hw_session[1234].sh\|profile_\|probe_256\|probe_fcycle" | grep -v $$ >/dev/null; do sleep 20; done
date > $O/hw_session5.log
echo "== probe_planes_pieces ==" >> $O/hw_session5.log
timeout 1800 python tools/probe_planes_pieces.py >> $O/hw_session5.log 2>&1
echo "== done ==" >> $O/hw_session5.log
date >> $O/hw_session5.log
