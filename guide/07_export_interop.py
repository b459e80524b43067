"""Guide 7 — Export & checkpoint interop.

The reference documents export in ``guide/export.ipynb`` (ONNX, CoreML,
TensorRT via torch).  This framework's export surfaces:

1. **StableHLO** (``export_stablehlo``) — the native portable artifact:
   the jitted forward as an ``jax.export`` archive that any XLA target
   (TPU, GPU, CPU) can load and run.
2. **ONNX** (``export_onnx``) — serialized with the built-in writer
   (``onnx_native.py``, no onnx/jax2onnx dependency) for EVERY
   registered basenet family, including the BotNet/Swin/XCiT/HRFormer
   attention trunks (static-shape export: masks, relative-position
   bias and resize index maps bake to initializers).
3. **Torch interop** (``migrate --from-torch``) — converts reference
   (torch) state dicts onto this parameter tree, exactly
   (tests/test_export_migrate.py pins a zero-diff roundtrip).

Run: ``python guide/07_export_interop.py`` (any backend; CI forces CPU).
"""

import os
import tempfile

import jax
import numpy as np

from openpifpaf_tpu import headmeta, models
from openpifpaf_tpu.plugins.coco import constants

workdir = tempfile.mkdtemp(prefix='guide07_')

# --- a small model to export ----------------------------------------------
cif = headmeta.Cif('cif', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                   sigmas=constants.COCO_PERSON_SIGMAS,
                   score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
caf = headmeta.Caf('caf', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                   sigmas=constants.COCO_PERSON_SIGMAS,
                   skeleton=constants.COCO_PERSON_SKELETON)
factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
model = factory.from_scratch('shufflenetv2k16', [cif, caf])
model.init(jax.random.key(0), input_hw=(49, 49))

ckpt = os.path.join(workdir, 'model.npz')
models.checkpoint.save(ckpt, variables=jax.tree.map(np.asarray,
                                                    model.variables),
                       head_metas=model.head_metas,
                       basenet_name='shufflenetv2k16', base_stride=16)
print('checkpoint:', ckpt)

# --- 1) ONNX via the native writer ----------------------------------------
from openpifpaf_tpu import export_onnx
from openpifpaf_tpu.onnx_native import parse_model

onnx_path = os.path.join(workdir, 'model.onnx')
export_onnx.apply(model, onnx_path, input_hw=(49, 49))
parsed = parse_model(open(onnx_path, 'rb').read())
print('onnx: opset', parsed['opset'], '-', len(parsed['nodes']), 'nodes,',
      len(parsed['initializers']), 'initializers')
assert parsed['inputs'][0]['shape'] == [1, 3, 49, 49]
assert len(parsed['outputs']) == 2          # cif + caf field tensors

# --- 2) StableHLO (the portable native artifact) ---------------------------
from openpifpaf_tpu import export_stablehlo

hlo_path = os.path.join(workdir, 'model.stablehlo')
exported = export_stablehlo.export_forward(model, (49, 49))
with open(hlo_path, 'wb') as f:
    f.write(exported.serialize())
print('stablehlo:', os.path.getsize(hlo_path), 'bytes')

# reload and run the exported artifact — no model code needed
rehydrated = export_stablehlo.load_exported(hlo_path)
x = np.zeros((1, 49, 49, 3), np.float32)
outs = rehydrated.call(x)
print('stablehlo forward shapes:', [np.asarray(o).shape for o in outs])
ref = model(x)
assert all(np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
           for a, b in zip(outs, ref))

# --- 3) torch state-dict interop -------------------------------------------
from openpifpaf_tpu.models import converter

state_dict = converter.to_torch_state_dict(model.variables,
                                           basenet_name='shufflenetv2k16')
print('torch state dict:', len(state_dict), 'tensors, e.g.',
      sorted(state_dict)[0])
variables = converter.convert_state_dict(state_dict,
                                         basenet_name='shufflenetv2k16')
flat_a = models.checkpoint.flatten_tree(model.variables)
flat_b = models.checkpoint.flatten_tree(variables)
diff = max(float(np.abs(flat_a[k] - flat_b[k]).max()) for k in flat_a)
print('roundtrip max diff:', diff)
assert diff == 0.0

print('guide 7 OK:', workdir)
