"""Visualization helpers (matplotlib) — parity with reference common/vis.py.

Accepts numpy or JAX arrays (converted with ``np.asarray``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_image", "plot_general", "plot_noise", "plot_bias_field",
           "plot_warped_grid"]


def _plt():
    import matplotlib.pyplot as plt
    return plt


def plot_image(data, ax=None, font_size=12, title="before"):
    """Grayscale image (reference vis.py:5-19)."""
    plt = _plt()
    data = np.asarray(data)
    target = ax if ax is not None else plt
    target.imshow(data, cmap="gray")
    if ax is not None:
        ax.set_title(title, size=font_size, weight="bold")
        ax.set_axis_off()
        ax.grid(False)
    else:
        plt.title(title, size=font_size, weight="bold")
        plt.axis("off")
    return ax


def plot_general(data, ax=None, font_size=12, title="", cmap="gray"):
    plt = _plt()
    data = np.asarray(data)
    target = ax if ax is not None else plt
    target.imshow(data, cmap=cmap)
    if ax is not None:
        ax.set_title(title, size=font_size, weight="bold")
        ax.set_axis_off()
        ax.grid(False)
    else:
        plt.title(title, size=font_size, weight="bold")
        plt.axis("off")
    return ax


def plot_noise(data, ax=None, font_size=12, title="rand noise"):
    """Diverging colormap centered like the reference (vis.py:39-56)."""
    plt = _plt()
    data = np.asarray(data)
    kwargs = dict(cmap="RdBu_r", interpolation="none",
                  vmin=-np.max(np.asarray(data)))
    if ax is not None:
        ax.imshow(data, **kwargs)
        ax.set_title(title, size=font_size, weight="bold")
        ax.set_axis_off()
        ax.grid(False)
    else:
        plt.imshow(data, **kwargs)
        plt.title(title, size=font_size, weight="bold")
        plt.axis("off")
    return ax


def plot_bias_field(data, ax=None, font_size=12, title="rand bias"):
    plt = _plt()
    data = np.asarray(data)
    if ax is not None:
        ax.imshow(data, cmap="jet")
        ax.set_title(title, size=font_size, weight="bold")
        ax.set_axis_off()
        ax.grid(False)
    else:
        plt.imshow(data, cmap="jet")
        plt.title(title, size=font_size)
        plt.axis("off")
    return ax


def plot_warped_grid(dvf, ax=None, bg_img=None, interval=3,
                     title=r"$\mathcal{T}_\phi$", fontsize=20,
                     linewidth=0.5, show=True):
    """Deformation grid lines over a background image
    (reference vis.py:75-130).  ``dvf``: (2, H, W) offsets in [-1, 1]."""
    plt = _plt()
    dvf = np.array(dvf, copy=True)
    background = np.asarray(bg_img) if bg_img is not None \
        else np.zeros(dvf.shape[1:])
    h, w = dvf.shape[1], dvf.shape[2]
    yy, xx = np.meshgrid(range(0, h, interval), range(0, w, interval),
                         indexing="ij")
    dvf[0] = dvf[0] * (background.shape[1] / 2)
    dvf[1] = dvf[1] * (background.shape[0] / 2)
    new_x = xx + dvf[0, yy, xx]
    new_y = yy + dvf[1, yy, xx]
    kwargs = {"linewidth": linewidth, "color": "r"}
    target = ax if ax is not None else plt
    if show:
        target.imshow(background, cmap="gray")
    for i in range(xx.shape[0]):
        target.plot(new_x[i, :], new_y[i, :], **kwargs)
    for i in range(xx.shape[1]):
        target.plot(new_x[:, i], new_y[:, i], **kwargs)
    if ax is not None:
        ax.set_title(title, fontsize=fontsize, weight="bold")
        ax.axis("off")
    else:
        plt.title(title, size=fontsize, weight="bold")
        plt.axis("off")
    return ax
