#!/bin/bash
# Run the queued chip-time jobs in priority order (docs/ROADMAP.md
# "Round 4 close-out"): the H2D overlap probe (decides
# EncoderConfig.h2d_chunks' auto default), the headline bench, and the
# damped-streaming throughput measurement. Each is its own process with
# its own timeout — a wedged tunnel phase costs one job, not the queue.
set -u
cd /root/repo
# Results tee into chip_logs/ (tracked) so the driver's round-end commit
# preserves them even if no builder session is alive when the queue runs.
mkdir -p chip_logs
echo "=== chip queue start $(date -u +%FT%TZ) ==="
echo "--- 1/4 overlap probe (put pipelining + h2d_chunks A/B) ---"
timeout 2400 python scripts/probe_tunnel_overlap.py 2>&1 | tee /tmp/chip_probe.log chip_logs/probe.log
echo "--- 2/4 bench ---"
timeout 900 python bench.py 2>&1 | tee /tmp/chip_bench.log chip_logs/bench.log
echo "--- 3/4 damped streaming throughput (100 s fixture) ---"
timeout 3600 python scripts/measure_damped_streaming.py --seconds 100 2>&1 | tee /tmp/chip_damped.log chip_logs/damped.log
echo "--- 4/4 AOT executable-serialization probe (cold-start economics) ---"
timeout 1800 python scripts/probe_aot_cache.py 2>&1 | tee /tmp/chip_aot.log chip_logs/aot.log
echo "=== chip queue done $(date -u +%FT%TZ) ===" | tee chip_logs/done.stamp
