#!/bin/bash
# theta-Pareto sweep (VERDICT r1 item 9): N x order grid, sequential
# TPU processes (one compile per config; theta is traced inside).
set -x
cd /root/repo
for n in 1e5 1e6; do
  timeout 2400 python scripts/speedtest.py -n=$n -b=128 -o=3
  timeout 2400 python scripts/speedtest.py -n=$n -b=128 -o=4
  timeout 2400 python scripts/speedtest.py -n=$n -b=256 -o=5
done
