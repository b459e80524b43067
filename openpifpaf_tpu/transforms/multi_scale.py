"""Multi-scale evaluation transform.

Reference parity: ``src/openpifpaf/transforms/multi_scale.py:~10`` — at
eval time, produce several rescaled copies of the image (optionally with
hflip); the predictor decodes each and merges the annotation sets.  Each
copy carries its own invertible meta so predictions map back to the
original pixel space before merging.
"""

from __future__ import annotations

import copy
import logging

from .compose import Compose
from .hflip import HFlip
from .pad import CenterPad
from .preprocess import Preprocess
from .scale import RescaleAbsolute

LOG = logging.getLogger(__name__)


class MultiScale(Preprocess):
    """Expand one sample into N rescaled (image, anns, meta) samples."""

    def __init__(self, long_edges, *, pad_to=None, hflip_keypoints=None,
                 hflip_table=None):
        self.pipelines = []
        for long_edge in long_edges:
            steps = [RescaleAbsolute(long_edge)]
            if pad_to:
                steps.append(CenterPad(max(long_edge, pad_to)))
            else:
                steps.append(CenterPad(long_edge))
            self.pipelines.append(Compose(steps))
            if hflip_keypoints is not None and hflip_table is not None:
                self.pipelines.append(Compose([
                    HFlip(hflip_keypoints, hflip_table),
                    RescaleAbsolute(long_edge),
                    CenterPad(long_edge),
                ]))

    def __call__(self, image, anns, meta):
        images, anns_list, metas = [], [], []
        for pipeline in self.pipelines:
            im, an, me = pipeline(copy.copy(image), copy.deepcopy(anns),
                                  copy.deepcopy(meta))
            images.append(im)
            anns_list.append(an)
            metas.append(me)
        return images, anns_list, metas
