"""Predict CLI: images -> pose annotations (JSON and/or rendered images).

Reference parity: ``src/openpifpaf/predict.py:~30`` — glob images, run the
Predictor, write ``--json-output`` and/or ``--image-output``.

Usage: ``python -m openpifpaf_tpu.predict image.jpg --checkpoint model.npz
--json-output out/``
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys

from . import datasets, decoder, logger, models, show, visualizer
from .predictor import Predictor

LOG = logging.getLogger(__name__)


def cli(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.predict',
        description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('images', nargs='*', help='input images')
    parser.add_argument('--glob', default=None,
                        help='glob expression for input images')
    parser.add_argument('-o', '--image-output', default=None, nargs='?',
                        const=True, help='annotated image output')
    parser.add_argument('--json-output', default=None, nargs='?',
                        const=True, help='json output file or directory')
    logger.cli(parser)
    models.Factory.cli(parser)
    decoder.cli(parser)
    Predictor.cli(parser)
    datasets.cli(parser)
    show.cli(parser)
    visualizer.cli(parser)
    args = parser.parse_args(argv)

    logger.configure(args)
    models.Factory.configure(args)
    decoder.configure(args)
    Predictor.configure(args)
    show.configure(args)
    visualizer.configure(args)
    return args


def out_name(arg, in_name: str, default_extension: str) -> str:
    if arg is True:
        return in_name + default_extension
    if os.path.isdir(arg):
        return os.path.join(arg, os.path.basename(in_name)) + default_extension
    return arg


def main(argv=None) -> int:
    args = cli(argv)
    image_paths = list(args.images)
    if args.glob:
        image_paths += glob.glob(args.glob)
    if not image_paths:
        LOG.error('no image files given')
        return 1

    predictor = Predictor(json_data=False)
    annotation_painter = None
    if args.image_output is not None:
        from .show.painters import AnnotationPainter  # lazy: pulls matplotlib
        from .show.canvas import image_canvas
        annotation_painter = AnnotationPainter()

    for pred, _, meta in predictor.images(image_paths):
        LOG.info('%s: %d annotations', meta['file_name'], len(pred))
        if args.json_output is not None:
            json_out_name = out_name(args.json_output, meta['file_name'],
                                     '.predictions.json')
            with open(json_out_name, 'w') as f:
                json.dump([ann.json_data() for ann in pred], f)
            LOG.info('json output = %s', json_out_name)
        if args.image_output is not None:
            import PIL.Image
            image_out_name = out_name(args.image_output, meta['file_name'],
                                      '.predictions.jpg')
            with PIL.Image.open(meta['file_name']) as im:
                from .show.canvas import image_canvas
                with image_canvas(im, image_out_name) as ax:
                    annotation_painter.annotations(ax, pred)
            LOG.info('image output = %s', image_out_name)
    return 0


if __name__ == '__main__':
    sys.exit(main())
