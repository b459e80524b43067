"""Visualization of predictions (matplotlib)."""

from .animation_frame import AnimationFrame
from .canvas import canvas, image_canvas, white_screen
from .painters import (AnnotationPainter, CrowdPainter, DetectionPainter,
                       KeypointPainter)

__all__ = ['AnimationFrame', 'canvas', 'image_canvas', 'white_screen', 'AnnotationPainter',
           'CrowdPainter', 'DetectionPainter', 'KeypointPainter']
