"""Visualization of predictions (matplotlib)."""

from .canvas import canvas, image_canvas, white_screen
from .painters import (AnnotationPainter, CrowdPainter, DetectionPainter,
                       KeypointPainter)

__all__ = ['canvas', 'image_canvas', 'white_screen', 'AnnotationPainter',
           'CrowdPainter', 'DetectionPainter', 'KeypointPainter']
