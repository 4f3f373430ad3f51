#!/bin/bash
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
while pgrep -f "hw_session[123].sh\|profile_\|probe_256" | grep -v $$ >/dev/null; do sleep 20; done
date > $O/hw_session4.log
echo "== probe_fcycle_pieces ==" >> $O/hw_session4.log
timeout 1800 python tools/probe_fcycle_pieces.py >> $O/hw_session4.log 2>&1
echo "== done ==" >> $O/hw_session4.log
date >> $O/hw_session4.log
