"""Experiment: toywb with BLOB_VAR 4.0 (ToyKp-sized rendered dots) x 600 epochs."""
import sys

from openpifpaf_tpu.plugins.toykp.toywb import ToyWbDataset

ToyWbDataset.BLOB_VAR = 4.0

from openpifpaf_tpu import train

sys.argv = [
    'train', '--dataset=toywb', '--basenet=shufflenetv2k16',
    '--epochs=600', '--batch-size=8', '--lr=0.01',
    '--lr-warm-up-epochs=5', '--lr-decay', '500', '560',
    '--val-interval=40', '--checkpoint-interval=200',
    '--output', 'out_toywb4/model',
]
sys.exit(train.main())
