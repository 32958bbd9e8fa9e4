#!/bin/bash
# r4 TPU measurement queue: wait for the tunnel to recover (tiny-probe
# < 15 s), then run the queued A/Bs and a fresh bench. Logs to
# /tmp/queue_r4b.log. Run inside tmux (no per-call timeout).
cd /root/repo || exit 1
LOG=/tmp/queue_r4b.log
: > "$LOG"

probe() {
  timeout 120 python - <<'EOF' 2>/dev/null
import time, jax, jax.numpy as jnp
x = jnp.zeros((8,128))
t0=time.time(); float(jax.jit(lambda x: (x+3).sum())(x))
dt=time.time()-t0
print(f'probe {dt:.1f}s')
exit(0 if dt < 15 else 1)
EOF
}

echo "$(date +%T) waiting for tunnel health" >> "$LOG"
until probe >> "$LOG" 2>&1; do
  echo "$(date +%T) tunnel still degraded" >> "$LOG"
  sleep 300
done
echo "$(date +%T) tunnel healthy — running queue" >> "$LOG"

echo "=== bilateral_variant_ab (v5) ===" >> "$LOG"
timeout 3000 python devscripts/profiling/bilateral_variant_ab.py >> "$LOG" 2>&1
echo "=== dbnet_deconv_ab (head pack) ===" >> "$LOG"
timeout 3000 python devscripts/profiling/dbnet_deconv_ab.py >> "$LOG" 2>&1
echo "=== bench.py ===" >> "$LOG"
timeout 3000 python bench.py >> "$LOG" 2>&1
echo "$(date +%T) queue done" >> "$LOG"
