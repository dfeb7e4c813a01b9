#!/bin/bash
cd /root/repo
LOG=results/real_zoo.log
run() { echo "### $*" >> $LOG; timeout 3000 "$@" 2>/dev/null | grep -v WARNING >> $LOG; }
run python -m pytorch_geometric_signed_directed_tpu.experiments.sssnet --dataset wikirfa --epochs 300 --seed 0
for seed in 0 1 2; do
  run python -m pytorch_geometric_signed_directed_tpu.experiments.msgnn_link --dataset fin_ynet2015 --task sign --epochs 500 --seed $seed
done
echo CATCHUP_DONE >> $LOG
