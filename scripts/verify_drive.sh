#!/bin/bash
# The /verify drive recipe (tiny end-to-end train_fp -> ptq on synthetic
# data).  Backend: first arg (cpu|axon), default cpu.  Exits non-zero on
# any mission failure; prints the PTQ metric tail for eyeballing.
set -e
BACKEND=${1:-cpu}
WORK=$(mktemp -d)
python -c "import sys; sys.path.insert(0,'/root/repo')
from efficientq_tpu.data.synthetic import make_synthetic_dataset
make_synthetic_dataset('$WORK', task='lits', n_subjects=4, vol_shape=(16,16,16))"
cd $WORK
TINY="--patch_size 8,8,8 --access_type npy --width 4,8,4 --depth 1,1,1 \
  --dilation 1,1,1 --init_stride 2,2,1 --blk mid --ds simple --hetero_dim \
  --drop_rate 0.0 --nMod 1 --nClass 3"
ENV="PYTHONPATH=/root/.axon_site:/root/repo"
[ "$BACKEND" = cpu ] && ENV="EFFQ_PLATFORM=cpu $ENV"
env $ENV python /root/repo/entrance.py train_fp \
  --task lits --data_dir $WORK/data --split_dir $WORK/split --round 1 \
  --batch_size 2 --crop_type random --loss hybrid --lr 0.01 --max_epoch 3 \
  --test_interval 3 --disp_interval 1 $TINY > train.log 2>&1
CKPT=$(ls exp_fp/lits/snap/round1/*/state_0003.pkl | head -1)
env $ENV python /root/repo/entrance.py ptq \
  --task lits --data_dir $WORK/data --split_dir $WORK/split --round 1 \
  --pretrain $CKPT --qconv effq --qlvl_w 4 --qlvl_a 4 --q_first 256,-1 \
  --q_last 256,-1 --lwq_patchsz 16,16,16 --lwq_iter 20 $TINY > ptq.log 2>&1
SNAP=$(ls -d exp_ptq/lits/snap/round1/*/ | head -1)
for f in time_cost.txt layer_loss.txt state_in_fp.pkl state_in_int8.pkl \
         state_in_int8_compress.npz ptq/val_seg.txt; do
  [ -e "$SNAP/$f" ] || { echo "MISSING $SNAP/$f"; exit 1; }
done
grep ", dsc = " ptq.log | tail -2
echo "verify_drive OK ($BACKEND) work=$WORK"
