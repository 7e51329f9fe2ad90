#!/bin/bash
# Probe the axon tunnel serially (never two axon processes at once — a
# concurrent axon process wedges the tunnel for everyone, see
# .claude/skills/verify/SKILL.md gotcha 1); the moment backend init
# succeeds, run the queued chip-time jobs (scripts/chip_queue.sh) once
# and exit. Probe cadence ~20 min (590 s probe + 600 s sleep) bounds the
# worst-case wasted window; 40 probes covers a full session.
set -u
cd /root/repo
for i in $(seq 1 40); do
  echo "=== probe $i $(date -u +%FT%TZ) ==="
  if timeout 590 python -c "
import jax, numpy as np
x = jax.device_put(np.ones((256,256),np.float32))
print('alive sum=%.0f' % float((x@x).sum()))
"; then
    echo "tunnel ALIVE at $(date -u +%FT%TZ); running chip queue"
    bash scripts/chip_queue.sh
    echo "chip queue finished at $(date -u +%FT%TZ)"
    exit 0
  fi
  echo "probe $i failed; sleeping 600"
  sleep 600
done
echo "gave up after 40 probes"
exit 1
