"""Decoder base: batched model forward + on-device field decoding.

Reference parity: ``src/openpifpaf/decoder/decoder.py`` — ``Decoder.batch``
runs the model forward and decodes per image.  The reference ships field
tensors to CPU worker processes (``:~90``); here decoding is a jitted XLA
program chained onto the forward pass, so fields never leave the device and
the worker pool disappears (that removal is the heart of the TPU redesign,
see SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse
import logging
import time
from typing import List

LOG = logging.getLogger(__name__)


class Decoder:
    """Base class for field decoders."""

    # profiling accumulator (reference: --profile-decoder)
    last_decoder_time = 0.0
    last_nn_time = 0.0
    profile = None  # output file for a cProfile of decode (--profile-decoder)

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        """Add decoder CLI options."""

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        """Apply parsed CLI options."""

    @classmethod
    def match(cls, head_metas) -> bool:
        """Can this decoder decode the given head metas?"""
        raise NotImplementedError

    def __call__(self, fields) -> List:
        """Decode a single image's fields into annotations."""
        raise NotImplementedError

    def batch(self, model, image_batch) -> List[List]:
        """Forward + decode a whole batch, fields staying on device."""
        start = time.perf_counter()
        fields = model(image_batch)
        self.__class__.last_nn_time = time.perf_counter() - start

        start = time.perf_counter()
        if Decoder.profile:
            from ..profiler import Profiler  # pylint: disable=import-outside-toplevel

            with Profiler(out_name=Decoder.profile)():
                result = self.batch_fields(fields)
        else:
            result = self.batch_fields(fields)
        self.__class__.last_decoder_time = time.perf_counter() - start
        return result

    def batch_fields(self, fields, metas=None) -> List[List]:
        """Decode batched field tensors (list of (B, F, C, H, W)).

        ``metas``: optional per-item image metas — stateful decoders
        (TrackingPose) use ``meta['sequence_id']`` to segment track state.
        """
        batch_size = fields[0].shape[0]
        return [self([f[i] for f in fields]) for i in range(batch_size)]
