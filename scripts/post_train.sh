#!/bin/bash
# Runs after the TPU training job exits: quality eval through the host
# predicted path, reference-style eval.py, then the throughput bench.
set -u
cd /root/repo

while pgrep -f "train.py configs/synth" > /dev/null; do sleep 60; done
echo "=== training done: $(date)"
tail -3 /tmp/train_tpu.log

echo "=== eval (host predicted path, trained ckpt)"
python scripts/eval_trained_host.py configs/synth/train.yaml \
    runs/synth_tpu/best.ckpt 8 2>&1 | grep -v WARNING

echo "=== bench (splat path, timing)"
NKSR_TIMING=1 python bench.py 2>&1 | grep -v WARNING

echo "=== done: $(date)"
