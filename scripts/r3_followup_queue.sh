#!/bin/bash
# Round-3 follow-up TPU queue. Waits for the multi-illum convergence run
# (pid in /tmp/mat_conv_multi.pid) to finish, then runs the next chip jobs
# SEQUENTIALLY (one TPU client at a time — see .claude/skills/verify/SKILL.md).
cd /root/repo
set -x
if [ -f /tmp/mat_conv_multi.pid ]; then
  while kill -0 "$(cat /tmp/mat_conv_multi.pid)" 2>/dev/null; do sleep 30; done
fi
# Fresh cache trace for the copies/slices instance dig (the cache stage sits
# at 50.7% of the HBM roofline with copies+slices ~41% of the step).
timeout 3600 python benchmarks/profile_material_step.py --cache \
  --trace-dir /tmp/cache_trace_r3 > /tmp/cache_prof_r3.log 2>&1
echo "rc=$?" >> /tmp/cache_prof_r3.log
# Glossy-scene quality run (roughness recovery — the NeRO axis).
timeout 10800 python scripts/material_convergence_check.py 1200 800 \
  --glossy-scene --analytic-normals --active --mat-batch 1536 \
  > /tmp/mat_conv_glossy.log 2>&1
echo "rc=$?" >> /tmp/mat_conv_glossy.log
