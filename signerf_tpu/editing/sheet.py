"""Reference-sheet composition, splicing, and splitting index math.

Capability parity (SURVEY.md §3.3): re-implements the sheet assembly of
`generate_reference_sheet` (/root/reference/signerf/datasetgenerator/
datasetgenerator.py:497-539: r x c grid of downscaled views, border width,
dimensions padded up to /8; image sheet initialized to ones, mask/condition
to zeros), the blend ``edited*mask + original*(1-mask)`` (:561-562), cell
split-back + upscale (:570-591), and the per-view splice into the LAST cell
(`generate_with_reference_sheet`, :637-659).

All jnp; cell placement uses static python-loop slicing (grid shape is
static), resizes use `jax.image.resize` (half-pixel sampling, matching
torch.nn.functional.interpolate(align_corners=False)).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SheetLayout:
    rows: int = 2
    cols: int = 3
    cell_height: int = 0  # scaled image dims
    cell_width: int = 0
    border: int = 0  # border_width_between_images

    @property
    def height(self) -> int:
        """Sheet height padded up to a multiple of 8 (reference :501-503)."""
        h = self.rows * self.cell_height + (self.rows - 1) * self.border
        return int(math.ceil(h / 8) * 8)

    @property
    def width(self) -> int:
        w = self.cols * self.cell_width + (self.cols - 1) * self.border
        return int(math.ceil(w / 8) * 8)

    def cell_slice(self, index: int) -> Tuple[slice, slice]:
        """(row_slice, col_slice) of grid cell ``index`` (row-major)."""
        row, col = index // self.cols, index % self.cols
        r0 = row * (self.cell_height + self.border)
        c0 = col * (self.cell_width + self.border)
        return slice(r0, r0 + self.cell_height), slice(c0, c0 + self.cell_width)

    @property
    def last_index(self) -> int:
        return self.rows * self.cols - 1


def resize_bilinear(img: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[H, W, C] -> [height, width, C] bilinear (align_corners=False)."""
    return jax.image.resize(
        img, (height, width, img.shape[-1]), method="linear", antialias=False
    )


def resize_mask(mask: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize then threshold > 0.5 (reference :527, :634)."""
    return (resize_bilinear(mask.astype(jnp.float32), height, width) > 0.5).astype(
        jnp.float32
    )


def compose_sheet(
    layout: SheetLayout,
    images: List[jnp.ndarray],  # each [ch, cw, 3], already scaled
    masks: List[jnp.ndarray],  # each [ch, cw, 1]
    conditions: List[jnp.ndarray],  # each [ch, cw, 1]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Place r*c-1 scaled views into the grid (last cell left empty).

    Returns (image_sheet [H,W,3] init ones, mask_sheet [H,W,1] init zeros,
    condition_sheet [H,W,1] init zeros) — reference :505-539.
    """
    h, w = layout.height, layout.width
    image_sheet = jnp.ones((h, w, 3), jnp.float32)
    mask_sheet = jnp.zeros((h, w, 1), jnp.float32)
    cond_sheet = jnp.zeros((h, w, 1), jnp.float32)
    for i, (img, msk, cnd) in enumerate(zip(images, masks, conditions)):
        rs, cs = layout.cell_slice(i)
        image_sheet = image_sheet.at[rs, cs, :].set(img)
        mask_sheet = mask_sheet.at[rs, cs, :].set(msk)
        cond_sheet = cond_sheet.at[rs, cs, :].set(cnd)
    return image_sheet, mask_sheet, cond_sheet


def splice_last_cell(
    layout: SheetLayout,
    image_sheet: jnp.ndarray,
    condition_sheet: jnp.ndarray,
    render_scaled: jnp.ndarray,  # [ch, cw, 3]
    mask_scaled: jnp.ndarray,  # [ch, cw, 1]
    condition_scaled: jnp.ndarray,  # [ch, cw, 1]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-view generation: splice the target view into the LAST grid cell;
    the mask sheet is zero everywhere except that cell (reference :637-651).
    """
    rs, cs = layout.cell_slice(layout.last_index)
    image_sheet = image_sheet.at[rs, cs, :].set(render_scaled)
    mask_sheet = jnp.zeros_like(condition_sheet).at[rs, cs, :].set(mask_scaled)
    condition_sheet = condition_sheet.at[rs, cs, :].set(condition_scaled)
    return image_sheet, mask_sheet, condition_sheet


def blend_with_mask(
    edited: jnp.ndarray, original: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """edited*mask + original*(1-mask) (reference :561-562, :652-655)."""
    return edited * mask + original * (1.0 - mask)


def split_cells(
    layout: SheetLayout, sheet: jnp.ndarray, count: int
) -> List[jnp.ndarray]:
    """Extract the first ``count`` cells of a sheet (reference :570-584)."""
    return [sheet[layout.cell_slice(i)] for i in range(count)]


def extract_last_cell(layout: SheetLayout, sheet: jnp.ndarray) -> jnp.ndarray:
    rs, cs = layout.cell_slice(layout.last_index)
    return sheet[rs, cs]
