"""Drift on the BLOB_VAR-4.0 toywb checkpoint (must render eval alike)."""
import runpy
import sys

from openpifpaf_tpu.plugins.toykp.toywb import ToyWbDataset

ToyWbDataset.BLOB_VAR = 4.0

sys.argv = ['trained_drift.py', '--checkpoint', 'out_toywb4/model.npz',
            '--dataset', 'toywb'] + sys.argv[1:]
runpy.run_path('tools/trained_drift.py', run_name='__main__')
