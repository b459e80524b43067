"""Video CLI: stream frames through the tracking (or pose) pipeline.

Reference parity: ``src/openpifpaf/video.py:~30`` — OpenCV capture
(file/webcam) -> Predictor stream -> live display; ``--start-frame`` /
``--skip-frames``; the tracking demo entry point.

TPU-first: with a tracking model the previous frame's *backbone features*
would be recomputable, but frames are fed as interleaved pairs through the
one compiled forward program (static shapes, no recompilation per frame).
Frame sources: a video file / webcam index (needs OpenCV, gated) or a
directory / glob of image frames (always available).

Usage: ``python -m openpifpaf_tpu.video --source frames_dir/
--checkpoint tracking.npz --video-output out.frames/``
"""

from __future__ import annotations

import argparse
import glob as glob_mod
import json
import logging
import os
import sys

import numpy as np

from . import decoder as decoder_mod
from . import headmeta, logger, models, show, transforms, visualizer
from .decoder.pose_similarity import PoseSimilarity
from .decoder.tracking_pose import TrackingPose

LOG = logging.getLogger(__name__)


class FrameReader:
    """Frames from a directory/glob of images (PIL) or cv2 source."""

    def __init__(self, source, start_frame: int = 0, skip_frames: int = 1,
                 max_frames: int = None):
        self.source = source
        self.start_frame = start_frame
        self.skip_frames = max(1, skip_frames)
        self.max_frames = max_frames

    def __iter__(self):
        import PIL.Image  # pylint: disable=import-outside-toplevel

        if os.path.isdir(self.source) or any(c in self.source for c in '*?['):
            pattern = (os.path.join(self.source, '*')
                       if os.path.isdir(self.source) else self.source)
            paths = sorted(p for p in glob_mod.glob(pattern)
                           if p.lower().endswith(
                               ('.jpg', '.jpeg', '.png', '.bmp')))
            paths = paths[self.start_frame::self.skip_frames]
            if self.max_frames:
                paths = paths[:self.max_frames]
            for i, path in enumerate(paths):
                with PIL.Image.open(path) as im:
                    yield i, path, np.asarray(im.convert('RGB'))
            return

        try:  # pragma: no cover - needs OpenCV + a video file/camera
            import cv2  # pylint: disable=import-outside-toplevel
        except ImportError as e:
            raise ValueError(
                f'source {self.source!r} is not an image directory/glob and '
                'OpenCV is not available for video decoding') from e
        capture = cv2.VideoCapture(
            int(self.source) if self.source.isdigit() else self.source)
        frame_i = -1
        produced = 0
        while True:
            ret, frame = capture.read()
            if not ret:
                break
            frame_i += 1
            if frame_i < self.start_frame \
                    or (frame_i - self.start_frame) % self.skip_frames:
                continue
            if self.max_frames and produced >= self.max_frames:
                break
            produced += 1
            yield frame_i, f'frame_{frame_i:06d}', frame[:, :, ::-1]
        capture.release()


class VideoProcessor:
    """Preprocess -> forward -> track, one frame at a time."""

    def __init__(self, model, *, long_edge: int = 321):
        import jax  # pylint: disable=import-outside-toplevel

        self.model = model
        self.long_edge = long_edge
        self.tracking = any(isinstance(m, headmeta.Tcaf)
                            for m in model.head_metas)
        if self.tracking:
            self.decoder = decoder_mod.factory(model.head_metas)
            assert isinstance(self.decoder, TrackingPose)
        else:
            cif_meta = model.head_metas[0]
            caf_meta = model.head_metas[1]
            self.decoder = PoseSimilarity(cif_meta, caf_meta)
        self.preprocess = transforms.Compose([
            transforms.NormalizeAnnotations(
                keypoints=getattr(model.head_metas[0], 'keypoints', []) or [],
                skeleton=[]),
            transforms.RescaleAbsolute(self.long_edge),
            transforms.CenterPad(self.long_edge),
            transforms.EVAL_TRANSFORM,
        ])
        self._forward = jax.jit(
            lambda variables, x: model.apply_fast(variables, x))
        if self.tracking:
            # cached-feature streaming (reference TrackingBase caches the
            # previous frame's features, network/tracking_base.py:~60):
            # the backbone runs on the NEW frame only; heads consume the
            # cached pair.
            self._backbone = jax.jit(
                lambda variables, x: model.backbone_features(variables, x))
            self._heads = jax.jit(
                lambda variables, feats: model.heads_from_features(
                    variables, feats))
        self.prev_features = None

    def process(self, frame_rgb: np.ndarray):
        """-> (annotations in original frame coords, meta)."""
        import jax.numpy as jnp  # pylint: disable=import-outside-toplevel
        import PIL.Image  # pylint: disable=import-outside-toplevel

        image = PIL.Image.fromarray(frame_rgb)
        processed, _, meta = self.preprocess(image, [], {})

        if self.tracking:
            curr_feats = self._backbone(
                self.model.variables, processed[None].astype(np.float32))
            prev_feats = (self.prev_features
                          if self.prev_features is not None else curr_feats)
            pair = jnp.concatenate([prev_feats, curr_feats], axis=0)
            fields = self._heads(self.model.variables, pair)
            preds = self.decoder([
                np.asarray(fields[0]), np.asarray(fields[1]),
                np.asarray(fields[2])[0],
            ])
            self.prev_features = curr_feats
        else:
            fields = self._forward(self.model.variables,
                                   processed[None].astype(np.float32))
            preds = self.decoder([np.asarray(f)[0] for f in fields])

        preds = [ann.inverse_transform(meta) for ann in preds]
        return preds, meta


def cli(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.video', description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--source', required=True,
                        help='video file, webcam index, image directory or '
                             'glob of frames')
    parser.add_argument('--video-output', default=None, nargs='?', const=True,
                        help='directory for annotated output frames')
    parser.add_argument('--json-output', default=None, nargs='?', const=True,
                        help='json-lines output file')
    parser.add_argument('--start-frame', default=0, type=int)
    parser.add_argument('--skip-frames', default=1, type=int)
    parser.add_argument('--max-frames', default=None, type=int)
    parser.add_argument('--long-edge', default=321, type=int)
    parser.add_argument('--show', default=False, action='store_true')
    logger.cli(parser)
    models.Factory.cli(parser)
    decoder_mod.cli(parser)
    show.cli(parser)
    visualizer.cli(parser)
    args = parser.parse_args(argv)

    logger.configure(args)
    models.Factory.configure(args)
    decoder_mod.configure(args)
    show.configure(args)
    visualizer.configure(args)
    return args


def main(argv=None) -> int:
    args = cli(argv)
    model = models.Factory().factory()
    processor = VideoProcessor(model, long_edge=args.long_edge)
    LOG.info('tracking mode: %s', processor.tracking)

    json_file = None
    if args.json_output is not None:
        json_name = args.json_output if args.json_output is not True \
            else str(args.source).rstrip('/*') + '.predictions.jsonl'
        json_file = open(json_name, 'w')  # pylint: disable=consider-using-with
        LOG.info('json output: %s', json_name)

    out_dir = None
    painter = None
    if args.video_output is not None:
        out_dir = args.video_output if args.video_output is not True \
            else str(args.source).rstrip('/*') + '.predictions'
        os.makedirs(out_dir, exist_ok=True)
        from .show.painters import AnnotationPainter  # pylint: disable=import-outside-toplevel
        painter = AnnotationPainter()
        LOG.info('video output: %s', out_dir)

    reader = FrameReader(args.source, args.start_frame, args.skip_frames,
                         args.max_frames)
    n_frames = 0
    for frame_i, name, frame in reader:
        preds, _ = processor.process(frame)
        n_frames += 1
        LOG.info('frame %d: %d poses, ids %s', frame_i, len(preds),
                 [getattr(a, 'id_', -1) for a in preds])
        if json_file is not None:
            json_file.write(json.dumps({
                'frame': frame_i,
                'predictions': [ann.json_data() for ann in preds],
            }) + '\n')
        if out_dir is not None:
            from .show.canvas import image_canvas  # pylint: disable=import-outside-toplevel
            out_name = os.path.join(out_dir, f'{frame_i:06d}.jpg')
            with image_canvas(frame, out_name) as ax:
                painter.annotations(ax, preds)

    if json_file is not None:
        json_file.close()
    LOG.info('processed %d frames', n_frames)
    return 0 if n_frames else 1


if __name__ == '__main__':
    sys.exit(main())
