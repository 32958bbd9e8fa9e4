#!/bin/bash
# Round-3 queued TPU A/B batch (runs when the axon tunnel is back).
# Each study is an interleaved one-process A/B with eager per-arm tracing
# (see NOTES.md: env flags are read at trace time). Results land in
# /tmp/ab_r3/<name>.log; tail each for the verdict line.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/tmp/ab_r3
mkdir -p "$OUT"
cd /root/repo/devscripts/profiling

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3000 python "$@" > "$OUT/$name.log" 2>&1
  echo "--- exit $? ; tail:"
  tail -n 12 "$OUT/$name.log"
}

# 0. TPU-optimized HLO dumps (compile-only, cheap): fusion boundaries,
#    standalone copies/transposes, padded shapes — the visibility the
#    "pw convs 6x off roofline" / "glue 20 ms" questions need.
run hlo_lama hlo_dump.py lama_block
run hlo_ocr hlo_dump.py ocr_backbone
run hlo_dbnet hlo_dump.py dbnet

# 1. Settle the banded-reflect regression question (eager-trace A/B).
run reflect_ab reflect_fast_ab.py

# 2. Phase-packed transposed convs: LaMa ups (k3s2p1op1) arm.
run deconv_lama lama_flag_ab.py MIT_TPU_DECONV_PACK=0 MIT_TPU_DECONV_PACK=1

# 3. Phase-packed transposed convs: DBNet detection workload.
run deconv_dbnet dbnet_deconv_ab.py

# 4. FFC local-conv fusion variants.
run fuse_lg lama_flag_ab.py MIT_TPU_LAMA_FUSE_LG=0 MIT_TPU_LAMA_FUSE_LG=1 MIT_TPU_LAMA_FUSE_LG=2

# 5. Space-to-depth phase-packed shell (clean, uncontended this time).
run s2d lama_s2d_ab2.py

# 6. Downsample conv variants.
run downvars down_conv_variants.py

# 6b. Bound the lazy-perm decode win (permute/write-back cost probe).
run perm_bound ocr_perm_bound.py

# 7. Fresh decomposition with whatever defaults won above.
run decomp2 lama_decomp2.py

# 8. Fresh end-to-end bench number.
echo "=== bench.py ($(date +%H:%M:%S))"
( cd /root/repo && timeout 3000 python bench.py > "$OUT/bench.log" 2>&1 )
echo "--- exit $? ; tail:"
tail -n 4 "$OUT/bench.log"

echo "ALL DONE $(date)"
