"""Matplotlib canvas context managers.

Reference parity: ``src/openpifpaf/show/canvas.py:~20`` — ``image_canvas``
(draw over an image) and ``canvas`` (blank axes), both save-or-show.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np


@contextmanager
def canvas(fig_file=None, *, show=True, dpi=150, nomargin=False, **kwargs):
    import matplotlib.pyplot as plt  # pylint: disable=import-outside-toplevel

    fig, ax = plt.subplots(**kwargs)
    yield ax
    fig.set_tight_layout(not nomargin)
    if fig_file:
        fig.savefig(fig_file, dpi=dpi)
    if show and not fig_file:  # pragma: no cover - interactive
        plt.show()
    plt.close(fig)


@contextmanager
def image_canvas(image, fig_file=None, *, show=True, dpi_factor=1.0,
                 fig_width=10.0, **kwargs):
    import matplotlib.pyplot as plt  # pylint: disable=import-outside-toplevel

    image = np.asarray(image)
    fig = plt.figure(figsize=(fig_width,
                              fig_width * image.shape[0] / image.shape[1]))
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.set_axis_off()
    ax.set_xlim(0, image.shape[1])
    ax.set_ylim(image.shape[0], 0)
    fig.add_axes(ax)
    ax.imshow(image, **kwargs)
    yield ax
    if fig_file:
        fig.savefig(fig_file, dpi=image.shape[1] / fig_width * dpi_factor)
    if show and not fig_file:  # pragma: no cover - interactive
        plt.show()
    plt.close(fig)


def white_screen(ax, alpha=0.9):
    ax.set_facecolor('white')
    ax.patch.set_alpha(alpha)
