"""Wexler exemplar-based inpainting, TPU-native.

Counterpart of ``WexlerInpaintingImpl`` (reference:
include/cpp/wexler_inpainting.hpp:10-332): coarse-to-fine Gaussian pyramid,
per level an onion-peel fill driven by contour priority, with ≤5
energy-minimization passes that keep a pass only if the weighted energy
decreased.

TPU-first redesign of the hot path: the reference's ``serach_exemplar``
(:220-269) is an exhaustive per-pixel O(W·H·13²) SSD scan, called once per
filled pixel.  Here one whole contour ring is batched and the scan becomes
two MXU matmuls per candidate strip:

    E[c, t] = Σ_i m_ti (a_ci − b_ti)²
            = (A² Mᵀ)[c, t] − 2 (A B'ᵀ)[c, t] + Σ_i m_ti b_ti²

with A = candidate patches, B' = mask-weighted target patches; candidates
whose 13×13 patch touches the hole are rejected via a box-sum of the
remaining mask (the reference's reject test, :238-241).

Known divergences from the strictly sequential reference, kept deliberately
(documented for the parity budget):
- all targets of one contour ring share the ring-start image state (the
  reference fills one pixel at a time, letting each fill feed the next
  search); energies are f32 on the MXU instead of exact ints;
- priority-queue tie order among equal-priority contour pixels follows
  contour order (std::priority_queue's heap order is unspecified anyway);
- odd pyramid levels: pyrUp output is cropped to the finer level's size
  (the reference feeds a 2×-even upsample into a masked copyTo, which
  asserts on odd level sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pyramid import pyr_down, pyr_up

WINDOW_SIZE = 13          # include/cpp/wexler_inpainting.hpp:326
WHALF = WINDOW_SIZE // 2
PYRAMID_BOTTOM_SIZE = 32  # :324
MAX_LOOP = 5              # :325
WEIGHT_BASE = 1.2         # :172
TARGET_CHUNK = 128        # smallest target bucket per jitted call
_BUCKETS = (128, 256, 512, 1024)
_MAX_TARGETS = _BUCKETS[-1]


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _MAX_TARGETS


# ---------------------------------------------------------------------------
# host-side helpers (sequential by nature in the reference)
# ---------------------------------------------------------------------------

_CHAIN = [(1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1)]
_NEXT_CODE = [7, 7, 1, 1, 3, 3, 5, 5]


def extract_mask_contour(mask: np.ndarray, start_x: int, start_y: int):
    """Freeman chain-code boundary trace (reference :94-145).  Robustness
    differences: raises instead of std::exit on malformed masks; rotates past
    out-of-bounds neighbours (the reference stops rotating and then reads the
    out-of-bounds pixel); single-pixel holes yield a 1-pixel contour.

    Uses the native C++ tracer (native/src/vip_native.cpp) when built."""
    from ..utils import native
    got = native.trace_contour(np.ascontiguousarray(mask, np.uint8),
                               start_x, start_y)
    if got is not None:
        return got
    h, w = mask.shape
    contour = []
    code_index = 5
    cx, cy = start_x, start_y
    length = 0
    while True:
        if cx == start_x and cy == start_y and length > 0:
            break
        if length > h * w:
            raise RuntimeError("contour did not converge")
        contour.append((cx, cy))
        x = cx + _CHAIN[code_index][0]
        y = cy + _CHAIN[code_index][1]
        search = 0
        while (not (0 <= x < w and 0 <= y < h) or mask[y, x] == 0) and search < 8:
            code_index = (code_index + 1) % 8
            x = cx + _CHAIN[code_index][0]
            y = cy + _CHAIN[code_index][1]
            search += 1
        if search >= 8:
            if length == 0:
                return contour  # isolated single-pixel hole (the reference
                # std::exits here, :132-135; a 1-pixel contour is well defined)
            raise RuntimeError("next contour pixel not found")
        cx, cy = x, y
        code_index = _NEXT_CODE[code_index]
        length += 1
    return contour


def _first_masked(mask: np.ndarray):
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    i = np.lexsort((xs, ys))[0]  # raster order
    return int(xs[i]), int(ys[i])


def calculate_weight(mask: np.ndarray) -> np.ndarray:
    """w = 1.2^(−min distance to contour) for hole pixels (reference :147-189)."""
    start = _first_masked(mask)
    if start is None:
        return mask.astype(np.float64)
    contour = np.array(extract_mask_contour(mask, *start), np.float64)  # (Nc, 2) x,y
    weight = np.zeros(mask.shape, np.float64)
    ys, xs = np.nonzero(mask)
    # chunked exact min-distance (hole pixels × contour points)
    for i in range(0, len(ys), 4096):
        yb = ys[i : i + 4096].astype(np.float64)
        xb = xs[i : i + 4096].astype(np.float64)
        d2 = (xb[:, None] - contour[None, :, 0]) ** 2 + (yb[:, None] - contour[None, :, 1]) ** 2
        dmin = np.minimum(np.sqrt(d2).min(axis=1), mask.shape[0] * mask.shape[1])
        weight[ys[i : i + 4096], xs[i : i + 4096]] = WEIGHT_BASE ** (-dmin)
    return weight


def contour_with_priority(mask: np.ndarray):
    """Contour pixels sorted by priority = #known pixels in the 13×13 window,
    descending (reference :191-218). Stable sort keeps contour order on ties."""
    start = _first_masked(mask)
    if start is None:
        return []
    contour = extract_mask_contour(mask, *start)
    h, w = mask.shape
    known = (mask == 0).astype(np.int32)
    # priority via box sums on a zero-padded known-map (out-of-range → 0)
    ii = np.zeros((h + 1, w + 1), np.int64)
    ii[1:, 1:] = known
    np.cumsum(ii, axis=0, out=ii)
    np.cumsum(ii, axis=1, out=ii)

    def box(y, x):
        y0, y1 = max(y - WHALF, 0), min(y + WHALF + 1, h)
        x0, x1 = max(x - WHALF, 0), min(x + WHALF + 1, w)
        return ii[y1, x1] - ii[y1, x0] - ii[y0, x1] + ii[y0, x0]

    prio = [int(box(y, x)) for x, y in contour]
    order = np.argsort(-np.array(prio), kind="stable")
    return [contour[i] for i in order]


# ---------------------------------------------------------------------------
# device-side batched exemplar search
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("height", "width", "initial",
                                              "all_full"))
def _ring_search(image_f: jax.Array, remained: jax.Array, tx: jax.Array,
                 ty: jax.Array, tvalid: jax.Array, height: int, width: int,
                 initial: bool, all_full: bool = False):
    """Find the best exemplar for each of ≤TARGET_CHUNK ring targets.

    image_f: (H, W, 3) f32; remained: (H, W) f32 (1 = hole);
    tx/ty: (T,) i32 target coords; tvalid: (T,) bool.
    all_full: every target's mask is all-ones (interior targets, non-initial
    pass) — the Σ m·a² term collapses to one per-candidate reduction instead
    of a (Ncand×507×T) matmul, roughly halving the search FLOPs.
    Returns a packed (3, T) f32 array: [best_energy, best_y, best_x].
    """
    t = tx.shape[0]
    patch_len = WINDOW_SIZE * WINDOW_SIZE * 3

    img_pad = jnp.pad(image_f, [(WHALF, WHALF), (WHALF, WHALF), (0, 0)])
    rem_pad = jnp.pad(remained, [(WHALF, WHALF), (WHALF, WHALF)])

    # target patches + masks ------------------------------------------------
    def grab(y, x):
        # centre (y, x) → padded top-left (y, x)
        patch = jax.lax.dynamic_slice(
            img_pad, (y, x, 0), (WINDOW_SIZE, WINDOW_SIZE, 3))
        rem = jax.lax.dynamic_slice(
            rem_pad, (y, x), (WINDOW_SIZE, WINDOW_SIZE))
        return patch, rem

    patches, rems = jax.vmap(grab)(ty, tx)          # (T, 13, 13, 3), (T, 13, 13)
    dy = jnp.arange(-WHALF, WHALF + 1)
    in_range = ((ty[:, None] + dy[None, :] >= 0) & (ty[:, None] + dy[None, :] < height))
    in_range_x = ((tx[:, None] + dy[None, :] >= 0) & (tx[:, None] + dy[None, :] < width))
    m = in_range[:, :, None] & in_range_x[:, None, :]      # (T, 13, 13)
    if initial:
        m = m & (rems == 0)    # skip the target's own unknown pixels (:244-246)
    m3 = jnp.repeat(m[:, :, :, None], 3, axis=3)
    b = patches.reshape(t, patch_len)
    mflat = m3.reshape(t, patch_len).astype(jnp.float32)
    b_masked = (b * mflat)                                   # B'
    b2_const = jnp.sum(b_masked * b, axis=1)                 # Σ m b²  (T,)

    # candidate sweep over row strips ----------------------------------------
    n_cy = height - 2 * WHALF   # candidate centre rows: WHALF .. H-WHALF-1
    n_cx = width - 2 * WHALF
    strip = 32
    n_strips = -(-n_cy // strip)
    # pad rows so the last strip's slab never clamps (dynamic_slice clamps
    # its start, which would silently shift candidate coordinates)
    pad_rows = n_strips * strip + 2 * WHALF - height
    image_pad_rows = jnp.pad(image_f, [(0, max(pad_rows, 0)), (0, 0), (0, 0)])

    # candidate validity: no remaining pixel in the patch (box sum == 0)
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(remained, axis=0), axis=1),
                 [(1, max(pad_rows, 0) + 1), (1, 1)])

    def strip_best(s, carry):
        best_e, best_y, best_x = carry
        y0 = s * strip  # candidate row offset within [0, n_cy)
        # patches for candidate centres rows y0..y0+strip-1 (centre = row+WHALF)
        slab = jax.lax.dynamic_slice(
            image_pad_rows, (y0, 0, 0), (strip + 2 * WHALF, width, 3))
        patches_c = jax.lax.conv_general_dilated_patches(
            slab.transpose(2, 0, 1)[None],                 # (1, 3, rows, W)
            (WINDOW_SIZE, WINDOW_SIZE), (1, 1), "VALID")   # (1, 3*169, strip, n_cx)
        a = patches_c[0].reshape(3, WINDOW_SIZE, WINDOW_SIZE, strip, n_cx)
        a = a.transpose(3, 4, 1, 2, 0).reshape(strip * n_cx, patch_len)
        # validity via integral of `remained` over the candidate window
        cy = y0 + jnp.arange(strip)
        y1c = cy[:, None] + 2 * WHALF + 1
        x0c = jnp.arange(n_cx)[None, :]
        x1c = x0c + 2 * WHALF + 1
        box_sum = (ii[y1c, x1c] - ii[y1c, x0c] - ii[cy[:, None], x1c]
                   + ii[cy[:, None], x0c])
        valid = (box_sum == 0).reshape(-1)
        row_ok = (cy < n_cy)[:, None].repeat(n_cx, 1).reshape(-1)

        # (bf16 inputs would be exact for u8 patch values and run the MXU 4×
        # faster, but the per-strip cast/relayout overhead measured slower
        # end-to-end — keep f32)
        cross = jnp.dot(a, b_masked.T, preferred_element_type=jnp.float32)
        if all_full:
            sum_a2 = jnp.sum(a * a, axis=1, keepdims=True)  # (Nc, 1)
            e = sum_a2 - 2.0 * cross
        else:
            e = (jnp.dot(a * a, mflat.T, preferred_element_type=jnp.float32)
                 - 2.0 * cross)
        e = jnp.where((valid & row_ok)[:, None], e, jnp.float32(np.inf))
        idx = jnp.argmin(e, axis=0)                          # (T,)
        emin = jnp.take_along_axis(e, idx[None, :], axis=0)[0]
        better = emin < best_e
        cyy = (y0 + idx // n_cx + WHALF).astype(jnp.int32)
        cxx = (idx % n_cx + WHALF).astype(jnp.int32)
        return (jnp.where(better, emin, best_e),
                jnp.where(better, cyy, best_y),
                jnp.where(better, cxx, best_x))

    init = (jnp.full((t,), np.inf, jnp.float32),
            jnp.zeros((t,), jnp.int32), jnp.zeros((t,), jnp.int32))
    best_e, best_y, best_x = jax.lax.fori_loop(0, n_strips, strip_best, init)
    best_e = best_e + b2_const
    best_e = jnp.where(tvalid, best_e, 0.0)
    # one packed array → ONE host download per chunk (separate np.asarray
    # calls each cost a full tunnel round-trip); positions < 2²⁴ are exact
    # in f32
    return jnp.stack([best_e, best_y.astype(jnp.float32),
                      best_x.astype(jnp.float32)])


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

class WexlerInpainting:
    """checkpoint_dir: if set, the per-level filled state is saved after each
    pyramid level and ``apply`` resumes from the deepest completed level — the
    checkpoint/resume story the reference lacks (SURVEY.md §5: its closest
    analog is keeping per-level pyramid state in memory,
    include/cpp/wexler_inpainting.hpp:45-49)."""

    def __init__(self, max_loop: int = MAX_LOOP,
                 pyramid_bottom_size: int = PYRAMID_BOTTOM_SIZE,
                 verbose: bool = False, checkpoint_dir: str | None = None):
        self.max_loop = max_loop
        self.pyramid_bottom_size = pyramid_bottom_size
        self.verbose = verbose
        self.checkpoint_dir = checkpoint_dir

    def _log(self, *args):
        if self.verbose:
            print(*args, flush=True)

    def _construct_pyramid(self, src: np.ndarray, mask: np.ndarray):
        """Reference :68-91: pyrDown until the next level's floor-halved
        min dimension drops below pyramid_bottom_size.  Level 0 is a copy —
        the fill loop mutates it (the reference clones too, :69-70)."""
        srcs, masks = [np.array(src, copy=True)], [np.array(mask, copy=True)]
        while min(srcs[-1].shape[0] // 2, srcs[-1].shape[1] // 2) >= self.pyramid_bottom_size:
            # np.array copies: np.asarray of a jax array is a read-only view,
            # and the fill loop mutates the levels in place
            srcs.append(np.array(pyr_down(srcs[-1])))
            masks.append(np.array(pyr_down(masks[-1])))
        return srcs, masks

    def _fill_pass(self, image: np.ndarray, mask: np.ndarray,
                   weight: np.ndarray, initial: bool):
        """One exemplar_based_inpainting pass (reference :271-322).
        Returns (filled image, total energy) or energy −1 on failure."""
        h, w = mask.shape
        remained = (mask > 0).astype(np.uint8).copy()
        img_dev = jnp.asarray(image).astype(jnp.float32)
        total_energy = 0.0

        # `remained` lives twice: a host mirror (contour extraction) and a
        # device copy (candidate validity + fills) — both updated by the same
        # fills, so NO per-ring host↔device transfer is needed.
        rem_dev = jnp.asarray(remained).astype(jnp.float32)
        while True:
            if not remained.any():
                break
            ring = contour_with_priority(remained)
            if not ring:
                break
            # one device call per ring chunk, bucketed target padding
            for i in range(0, len(ring), _MAX_TARGETS):
                chunk = ring[i : i + _MAX_TARGETS]
                t = len(chunk)
                bucket = _bucket(t)
                pad = bucket - t
                tx = np.array([p[0] for p in chunk] + [0] * pad, np.int32)
                ty = np.array([p[1] for p in chunk] + [0] * pad, np.int32)
                tvalid = np.array([True] * t + [False] * pad)
                interior = ((tx[:t] >= WHALF) & (tx[:t] < w - WHALF)
                            & (ty[:t] >= WHALF) & (ty[:t] < h - WHALF))
                all_full = (not initial) and bool(interior.all())
                packed = np.asarray(_ring_search(
                    img_dev, rem_dev, jnp.asarray(tx), jnp.asarray(ty),
                    jnp.asarray(tvalid), h, w, initial, all_full))
                e = packed[0]
                by = packed[1, :t].astype(np.int32)
                bx = packed[2, :t].astype(np.int32)
                if not np.isfinite(e[:t]).all():
                    return image, -1.0  # exemplar not found (:308-311)
                total_energy += float(
                    (e[:t] * weight[ty[:t], tx[:t]]).sum())
                # batched fill of this chunk (device + host mirrors)
                tyd = jnp.asarray(ty[:t])
                txd = jnp.asarray(tx[:t])
                img_dev = img_dev.at[tyd, txd].set(img_dev[jnp.asarray(by), jnp.asarray(bx)])
                rem_dev = rem_dev.at[tyd, txd].set(0.0)
                remained[ty[:t], tx[:t]] = 0
        filled = np.clip(np.asarray(img_dev), 0, 255).astype(np.uint8)
        return filled, total_energy

    def apply(self, src, mask) -> np.ndarray:
        """(H, W, 3) u8 image + (H, W) u8 mask (hole > 0) → (H, W, 3) u8."""
        src = np.asarray(src)
        mask = np.asarray(mask)
        if src.shape[:2] != mask.shape:
            raise ValueError("src and mask sizes differ")
        srcs, masks = self._construct_pyramid(src, mask)
        num_layers = len(srcs)

        do_initial = True
        start_layer = num_layers - 1
        ckpt_path = None
        if self.checkpoint_dir is not None:
            import os
            os.makedirs(self.checkpoint_dir, exist_ok=True)
            ckpt_path = os.path.join(self.checkpoint_dir, "wexler_state.npz")
            if os.path.exists(ckpt_path):
                state = np.load(ckpt_path)
                if (int(state["num_layers"]) == num_layers
                        and state["src_0"].shape == srcs[0].shape):
                    start_layer = int(state["next_layer"])
                    do_initial = bool(state["do_initial"])
                    for i in range(num_layers):
                        srcs[i] = state[f"src_{i}"]
                    self._log(f"resuming from layer {start_layer}")

        for layer in range(start_layer, -1, -1):
            self._log(f"Layer {layer}...")
            weight = calculate_weight(masks[layer] > 0)

            if do_initial:
                filled, energy = self._fill_pass(srcs[layer], masks[layer],
                                                 weight, initial=True)
                if energy < 0:
                    self._log(f"failed to inpaint layer {layer}")
                else:
                    srcs[layer] = filled
                    do_initial = False

            current_energy = np.inf
            for loop in range(self.max_loop):
                candidate, energy = self._fill_pass(srcs[layer], masks[layer],
                                                    weight, initial=False)
                self._log(f"  loop {loop + 1}: energy {energy}")
                if current_energy <= energy:
                    break
                current_energy = energy
                hole = masks[layer] > 0
                srcs[layer][hole] = candidate[hole]

            if layer > 0:
                up = np.asarray(pyr_up(srcs[layer],
                                       out_shape=srcs[layer - 1].shape[:2]))
                hole = masks[layer - 1] > 0
                srcs[layer - 1][hole] = up[hole]

            if ckpt_path is not None:
                np.savez(ckpt_path, num_layers=num_layers,
                         next_layer=layer - 1, do_initial=do_initial,
                         **{f"src_{i}": srcs[i] for i in range(num_layers)})

        return srcs[0]
