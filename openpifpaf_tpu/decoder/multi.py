"""Run several decoders on one model output.

Reference parity: ``src/openpifpaf/decoder/multi.py:~10``.
"""

from __future__ import annotations

from typing import List

from .decoder import Decoder


class Multi(Decoder):
    def __init__(self, decoders: List[Decoder]):
        self.decoders = decoders

    def __call__(self, fields) -> List:
        return [ann for d in self.decoders for ann in d(fields)]

    def batch_fields(self, fields, metas=None) -> List[List]:
        per_decoder = [d.batch_fields(fields, metas=metas)
                       for d in self.decoders]
        return [[ann for dec_out in per_decoder for ann in dec_out[i]]
                for i in range(len(per_decoder[0]))]
