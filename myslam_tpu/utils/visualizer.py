"""In-loop frame visualization: GT / rendered / residual panels.

Re-derivation of the reference Frame_Visualizer
(src/utils/Frame_Visualizer.py:53-122): at configured frequencies, render
the full frame from the current pose and save a 2x3 matplotlib panel
(depth GT/rendered/residual, color GT/rendered/residual) as jpg under
{output}/tracking_vis or {output}/mapping_vis.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from myslam_tpu.render.renderer import make_image_renderer


class FrameVisualizer:
    def __init__(self, freq: int, inside_freq: int, vis_dir: str,
                 scene, cam, verbose: bool = False):
        self.freq = max(int(freq), 1)
        self.inside_freq = max(int(inside_freq), 1)
        self.vis_dir = vis_dir
        self.verbose = verbose
        os.makedirs(vis_dir, exist_ok=True)
        self._render_img = make_image_renderer(scene, cam)

    def save_imgs(self, idx: int, iter_i: int, gt_depth, gt_color,
                  c2w, ms, key) -> str | None:
        """Gated by (idx % freq == 0) and (iter % inside_freq == 0)
        (reference Frame_Visualizer.py:67)."""
        if idx % self.freq != 0 or iter_i % self.inside_freq != 0:
            return None
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        depth, color = self._render_img(ms, jnp.asarray(c2w),
                                        jnp.asarray(gt_depth), key)
        gt_depth_np = np.asarray(gt_depth)
        gt_color_np = np.asarray(gt_color, np.float32)
        depth_np = np.asarray(depth)
        color_np = np.asarray(color)

        depth_residual = np.abs(gt_depth_np - depth_np)
        depth_residual[gt_depth_np == 0.0] = 0.0
        color_residual = np.abs(gt_color_np - color_np)
        color_residual[gt_depth_np == 0.0] = 0.0

        fig, axs = plt.subplots(2, 3, figsize=(12, 6))
        max_depth = float(np.max(gt_depth_np)) or 1.0
        titles = ["Input Depth", "Generated Depth", "Depth Residual",
                  "Input RGB", "Generated RGB", "RGB Residual"]
        images = [gt_depth_np, depth_np, depth_residual,
                  gt_color_np, np.clip(color_np, 0, 1),
                  np.clip(color_residual, 0, 1)]
        for k, ax in enumerate(axs.flat):
            if k < 3:
                ax.imshow(images[k], cmap="plasma", vmin=0, vmax=max_depth)
            else:
                ax.imshow(images[k])
            ax.set_title(titles[k])
            ax.set_xticks([])
            ax.set_yticks([])
        plt.tight_layout()
        out = os.path.join(self.vis_dir, f"{idx:05d}_{iter_i:04d}.jpg")
        fig.savefig(out, bbox_inches="tight", pad_inches=0.2, dpi=90)
        plt.close(fig)
        if self.verbose:
            print(f"Saved rendering visualization at {out}")
        return out
