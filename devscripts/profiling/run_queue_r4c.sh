#!/bin/bash
# r4 follow-up queue: waits for run_queue_r4b.sh to finish (its 'queue
# done' marker), then runs the bilateral v5/v5w A/B, the OCR pw-dot A/B,
# and a TPU xprof trace attempt. Logs to /tmp/queue_r4c.log.
cd /root/repo || exit 1
LOG=/tmp/queue_r4c.log
: > "$LOG"

echo "$(date +%T) waiting for r4b queue to finish" >> "$LOG"
until grep -q "queue done" /tmp/queue_r4b.log 2>/dev/null; do
  sleep 60
done
echo "$(date +%T) r4b done — running follow-ups" >> "$LOG"

echo "=== bilateral_variant_ab (v5/v5w) ===" >> "$LOG"
timeout 3000 python devscripts/profiling/bilateral_variant_ab.py >> "$LOG" 2>&1
echo "=== ocr_backbone_pwdot_ab ===" >> "$LOG"
timeout 3000 python devscripts/profiling/ocr_backbone_pwdot_ab.py >> "$LOG" 2>&1
echo "=== xprof_trace ocr_backbone (TPU) ===" >> "$LOG"
timeout 1800 python devscripts/profiling/xprof_trace.py ocr_backbone hlo_stats >> "$LOG" 2>&1
echo "$(date +%T) r4c queue done" >> "$LOG"
