"""Guide 1 — Prediction API.

The reference documents this workflow in ``guide/prediction.ipynb``:
load a model, run the Predictor over images, inspect/paint annotations.
Here the decode runs on-device inside the same XLA program as the forward
pass, so the Predictor yields results without any host-side decoding step.

Run: ``python guide/01_predict.py`` (any JAX backend; CI forces CPU).
"""

import os
import tempfile

import matplotlib
matplotlib.use('Agg')

import jax
import numpy as np
import PIL.Image

from openpifpaf_tpu import headmeta, models, show
from openpifpaf_tpu.predictor import Predictor
from openpifpaf_tpu.plugins.coco import constants

workdir = tempfile.mkdtemp(prefix='guide01_')

# --- a model -------------------------------------------------------------
# Real use: Predictor(checkpoint='shufflenetv2k16-cocokp.npz').  The guide
# builds an untrained model so it runs offline; predictions will be empty
# or low-confidence, the mechanics are identical.
cif = headmeta.Cif('cif', 'cocokp',
                   keypoints=constants.COCO_KEYPOINTS,
                   sigmas=constants.COCO_PERSON_SIGMAS,
                   pose=constants.COCO_UPRIGHT_POSE,
                   draw_skeleton=constants.COCO_PERSON_SKELETON,
                   score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
caf = headmeta.Caf('caf', 'cocokp',
                   keypoints=constants.COCO_KEYPOINTS,
                   sigmas=constants.COCO_PERSON_SIGMAS,
                   pose=constants.COCO_UPRIGHT_POSE,
                   skeleton=constants.COCO_PERSON_SKELETON)
factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
model = factory.from_scratch('shufflenetv2k16', [cif, caf])
model.init(jax.random.key(0))

# --- an image ------------------------------------------------------------
rng = np.random.default_rng(0)
image_path = os.path.join(workdir, 'image.jpg')
PIL.Image.fromarray(
    rng.integers(0, 255, (120, 160, 3), np.uint8), 'RGB').save(image_path)

# --- predict -------------------------------------------------------------
Predictor.long_edge = 97  # rescale + pad target (default 641)
predictor = Predictor(model=model)
for pred, _, meta in predictor.images([image_path]):
    print(f'{meta["file_name"]}: {len(pred)} poses')
    for ann in pred:
        # ann.data is a (17, 3) array of (x, y, confidence) in ORIGINAL
        # image coordinates (the preprocessing meta is inverted for you)
        print('  score', round(ann.score, 3), 'joints',
              int((ann.data[:, 2] > 0).sum()))

    # --- paint -----------------------------------------------------------
    with show.image_canvas(np.asarray(PIL.Image.open(image_path)),
                           os.path.join(workdir, 'out.png'),
                           show=False) as ax:
        show.AnnotationPainter().annotations(ax, pred)

assert os.path.exists(os.path.join(workdir, 'out.png'))
print('painted to', os.path.join(workdir, 'out.png'))
print('guide 01 OK')
