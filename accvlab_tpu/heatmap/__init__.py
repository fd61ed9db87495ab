"""accvlab_tpu.heatmap — batched Gaussian heatmap rasterization for TPU.

TPU-native equivalent of ACCV-Lab's ``accvlab.draw_heatmap`` package
(Pallas kernel + XLA golden model; see :mod:`accvlab_tpu.heatmap.draw`).
"""

from .draw import draw_heatmap, draw_heatmap_batched
from .draw_gaussians import draw_gaussians

__all__ = ["draw_gaussians", "draw_heatmap", "draw_heatmap_batched"]
