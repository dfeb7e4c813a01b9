#!/bin/bash
# Real-data zoo: every bundled dataset family the loaders support but no
# experiment had ever consumed (VERDICT r4 item 1). Logs to results/real_zoo.log.
cd /root/repo
LOG=results/real_zoo.log
: > $LOG
run() { echo "### $*" >> $LOG; timeout 3000 "$@" 2>/dev/null | grep -v WARNING >> $LOG; }

for seed in 0 1 2; do
  run python -m pytorch_geometric_signed_directed_tpu.experiments.digrac --dataset blog --K 2 --epochs 1000 --seed $seed
  run python -m pytorch_geometric_signed_directed_tpu.experiments.digrac --dataset migration --K 10 --epochs 1000 --seed $seed
  run python -m pytorch_geometric_signed_directed_tpu.experiments.digrac --dataset lead_lag2015 --K 10 --epochs 1000 --seed $seed
done
for seed in 0 1 2; do
  run python -m pytorch_geometric_signed_directed_tpu.experiments.sssnet --dataset rainfall --epochs 300 --seed $seed
  run python -m pytorch_geometric_signed_directed_tpu.experiments.sssnet --dataset ppi --epochs 300 --seed $seed
  run python -m pytorch_geometric_signed_directed_tpu.experiments.sssnet --dataset fin_ynet2015 --epochs 300 --seed $seed
  run python -m pytorch_geometric_signed_directed_tpu.experiments.sssnet --dataset wikirfa --epochs 300 --seed $seed
done
for seed in 0 1 2; do
  run python -m pytorch_geometric_signed_directed_tpu.experiments.msgnn_link --dataset FiLL-pvCLCL2015 --sparsify_level 0.2 --epochs 500 --seed $seed
  run python -m pytorch_geometric_signed_directed_tpu.experiments.msgnn_link --dataset FiLL-OPCL2015 --sparsify_level 0.2 --epochs 500 --seed $seed
  run python -m pytorch_geometric_signed_directed_tpu.experiments.msgnn_link --dataset fin_ynet2015 --task sign --epochs 500 --seed $seed
done
echo DONE >> $LOG
