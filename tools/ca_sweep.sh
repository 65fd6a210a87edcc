#!/bin/bash
# CA-env high-throughput tuning sweep: can fused/at-scale configs close the
# quality gap to the update-dense 92.7%-arrivals regime? One TPU process at a
# time (sequential). Each run: 4M env steps, then arrival/collision eval of
# the exported bundle over 16 envs x 5000 steps (one full episode horizon).
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-4e6}

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  python -m usv_tpu.train.run_sac --env usv-asmc-ca-v0 \
    --total-steps "$STEPS" --buffer-size 400000 --light-checkpoints \
    --checkpoint-every-blocks 0 --logdir "runs/ca_sweep/$name" "$@" \
    2>&1 | tail -20
  python -m usv_tpu.train.run_eval --env usv-asmc-ca-v0 \
    --policy "runs/ca_sweep/$name/policy" --out "runs/ca_sweep/$name/eval" \
    --steps 5000 --episodes 16 2>&1 | tail -3
}

# C1: 1024 envs, 8 fused-by-8 update rounds of 64 grad steps, lr 3e-4
run c1_1024e_g64k8 --num-envs 1024 --train-freq 8 --gradient-steps 64 \
  --update-fusion 8 --lr 3e-4 --rounds-per-block 61 --eval-every-blocks 2
# C2: same but double update density
run c2_1024e_g128k8 --num-envs 1024 --train-freq 8 --gradient-steps 128 \
  --update-fusion 8 --lr 3e-4 --rounds-per-block 61 --eval-every-blocks 2
# C3: 2048 envs, same per-round updates (half the update:data ratio), bigger lr
run c3_2048e_g64k8 --num-envs 2048 --train-freq 8 --gradient-steps 64 \
  --update-fusion 8 --lr 5e-4 --rounds-per-block 31 --eval-every-blocks 2
echo "=== sweep done ==="
