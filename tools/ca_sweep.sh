#!/bin/bash
# CA-env high-throughput tuning sweep: close the quality gap to the
# update-dense 92.7%-arrivals regime WITHOUT giving up the >1M steps/s
# collect rate. Round-1 finding (4M-step runs): quality tracks the
# optimizer-step x batch budget — at 1 fused update per 1024 env steps,
# 4M env steps is only ~8k optimizer steps (vs ~500k for the dense 64-env
# config), so the fused configs were simply under-trained. At 1.2M steps/s
# an 8x longer run costs ~25 s of extra steady-state TPU time and matches
# the dense regime's sample-update budget.
#
# One TPU process at a time (sequential). Each run ends with an
# arrival/collision eval of the exported bundle (16 envs x 5000 steps).
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-32e6}

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

# d1: 1024 envs, 8 fused-by-8 updates of batch 2048 per round, lr 3e-4
run d1_1024e_g64k8_32M --num-envs 1024 --train-freq 8 --gradient-steps 64 \
  --update-fusion 8 --lr 3e-4 --rounds-per-block 391 --eval-every-blocks 2
# d2: double update density, fold to batch 4096
run d2_1024e_g128k16_32M --num-envs 1024 --train-freq 8 --gradient-steps 128 \
  --update-fusion 16 --lr 3e-4 --rounds-per-block 391 --eval-every-blocks 2
# d3: d1 + linear lr decay to 10% over the run (~62k grad steps)
run d3_1024e_g64k8_lrdecay --num-envs 1024 --train-freq 8 --gradient-steps 64 \
  --update-fusion 8 --lr 3e-4 --lr-decay-steps 60000 \
  --rounds-per-block 391 --eval-every-blocks 2
echo "=== sweep done ==="
