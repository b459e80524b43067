"""Visualization of predictions (matplotlib)."""

from .animation_frame import AnimationFrame
from . import cli as cli_mod
from .canvas import canvas, image_canvas, white_screen
from .painters import (AnnotationPainter, CrowdPainter, DetectionPainter,
                       KeypointPainter)

cli = cli_mod.cli
configure = cli_mod.configure

__all__ = ['AnimationFrame', 'cli', 'configure', 'canvas', 'image_canvas', 'white_screen', 'AnnotationPainter',
           'CrowdPainter', 'DetectionPainter', 'KeypointPainter']
