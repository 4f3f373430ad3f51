#!/bin/bash
cd /root/repo
export PYTHONUNBUFFERED=1
O=tools/out
while pgrep -f "hw_session[123456789].sh\|profile_\|probe_" | grep -v $$ >/dev/null; do sleep 20; done
date > $O/hw_session10.log
timeout 1200 python tools/probe_f64_gate.py >> $O/hw_session10.log 2>&1
echo "== done ==" >> $O/hw_session10.log
date >> $O/hw_session10.log
