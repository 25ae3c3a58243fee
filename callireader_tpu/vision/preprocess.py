"""Host-side image preprocessing with static-shape outputs.

Parity targets in /root/reference/utils/utils.py:
  - build_transform       :354-362  (resize 448 bicubic + ImageNet normalize)
  - find_closest_aspect_ratio :365-378
  - dynamic_preprocess    :381-417  (aspect-ratio tiling, max 12 + thumbnail)
  - load_image            :463-478  (main image)
  - load_image_2          :420-452  (char slices: scale max-edge into [200,350],
                                     center-pad white to 448, tile + thumbnail)

TPU-native design: everything returns numpy NHWC float32 arrays whose tile
count is one of a small static bucket set, so the jitted vision tower compiles
once per bucket instead of once per image. Actual resize runs on host (PIL,
matching the reference's bicubic), normalization is folded in here so the
device receives ready tensors.
"""

from __future__ import annotations

import io
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image, ImageOps

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

ImageLike = Union[str, Image.Image, np.ndarray]

# static tile-count buckets (1..12 tiles + optional thumbnail)
TILE_BUCKETS: Tuple[int, ...] = (1, 2, 3, 4, 5, 7, 9, 13)


def open_image(image: ImageLike) -> Image.Image:
    if isinstance(image, str):
        return Image.open(image).convert("RGB")
    if isinstance(image, bytes):
        return Image.open(io.BytesIO(image)).convert("RGB")
    if isinstance(image, np.ndarray):
        return Image.fromarray(image).convert("RGB")
    return image.convert("RGB") if image.mode != "RGB" else image


def to_tensor_normalized(img: Image.Image, input_size: int) -> np.ndarray:
    """resize bicubic -> [0,1] -> ImageNet normalize. Returns HWC f32."""
    img = img.convert("RGB") if img.mode != "RGB" else img
    img = img.resize((input_size, input_size), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def to_tensor_uint8(img: Image.Image, input_size: int) -> np.ndarray:
    """resize bicubic, keep uint8 HWC — ImageNet normalization happens
    on-device (4x less host->device transfer than f32; see
    models/internvit.normalize_uint8)."""
    img = img.convert("RGB") if img.mode != "RGB" else img
    img = img.resize((input_size, input_size), Image.BICUBIC)
    return np.asarray(img, np.uint8)


def find_closest_aspect_ratio(
    aspect_ratio: float,
    target_ratios: Sequence[Tuple[int, int]],
    width: int,
    height: int,
    image_size: int,
) -> Tuple[int, int]:
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target)
        if diff < best_diff:
            best_diff = diff
            best = ratio
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best = ratio
    return best


def dynamic_tile(
    image: Image.Image,
    min_num: int = 1,
    max_num: int = 12,
    image_size: int = 448,
    use_thumbnail: bool = False,
) -> List[Image.Image]:
    """Aspect-ratio-aware tiling (reference dynamic_preprocess)."""
    ow, oh = image.size
    aspect = ow / oh
    ratios = sorted(
        {
            (i, j)
            for n in range(min_num, max_num + 1)
            for i in range(1, n + 1)
            for j in range(1, n + 1)
            if min_num <= i * j <= max_num
        },
        key=lambda x: x[0] * x[1],
    )
    tw_r, th_r = find_closest_aspect_ratio(aspect, ratios, ow, oh, image_size)
    tw, th = image_size * tw_r, image_size * th_r
    blocks = tw_r * th_r
    resized = image.resize((tw, th))
    tiles = []
    cols = tw // image_size
    for i in range(blocks):
        box = (
            (i % cols) * image_size,
            (i // cols) * image_size,
            ((i % cols) + 1) * image_size,
            ((i // cols) + 1) * image_size,
        )
        tiles.append(resized.crop(box))
    if use_thumbnail and len(tiles) != 1:
        tiles.append(image.resize((image_size, image_size)))
    return tiles


def tile_grid(
    ow: int, oh: int, min_num: int = 1, max_num: int = 12, image_size: int = 448
) -> Tuple[int, int]:
    """The (cols, rows) grid dynamic_tile would pick for a (ow, oh) page —
    the host-side half of on-device tiling (engine.batch_tile_pages): grid
    selection is scalar math on the page dims; the pixel work (resize +
    split + thumbnail) runs on device."""
    aspect = ow / oh
    ratios = sorted(
        {
            (i, j)
            for n in range(min_num, max_num + 1)
            for i in range(1, n + 1)
            for j in range(1, n + 1)
            if min_num <= i * j <= max_num
        },
        key=lambda x: x[0] * x[1],
    )
    return find_closest_aspect_ratio(aspect, ratios, ow, oh, image_size)


def load_image(
    image: ImageLike, input_size: int = 448, max_num: int = 12, use_thumbnail: bool = True,
    as_uint8: bool = False,
) -> np.ndarray:
    """Main-image pipeline -> (num_tiles, H, W, C) NHWC (f32 normalized, or
    raw uint8 for on-device normalization)."""
    img = open_image(image)
    tiles = dynamic_tile(img, image_size=input_size, use_thumbnail=use_thumbnail, max_num=max_num)
    conv = to_tensor_uint8 if as_uint8 else to_tensor_normalized
    return np.stack([conv(t, input_size) for t in tiles])


def load_char_slice(
    image: ImageLike, input_size: int = 448, max_num: int = 12, as_uint8: bool = False
) -> np.ndarray:
    """Character-crop pipeline (reference load_image_2): scale longest edge into
    [200, 350] (bounds scaled with input_size), center-pad white to input_size,
    then tile (always 1 tile since the padded image is square input_size).
    -> (num_tiles, H, W, C)."""
    img = open_image(image)
    w, h = img.size
    lo = max(1, round(200 * input_size / 448))
    hi = max(2, round(350 * input_size / 448))
    m = max(w, h)
    if m <= lo:
        scale = lo / m
    elif m >= hi:
        scale = hi / m
    else:
        scale = 1.0
    nw, nh = int(w * scale), int(h * scale)
    img = img.resize((nw, nh))
    img = ImageOps.expand(
        img,
        border=(
            (input_size - nw) // 2,
            (input_size - nh) // 2,
            (input_size - nw + 1) // 2,
            (input_size - nh + 1) // 2,
        ),
        fill=(255, 255, 255),
    )
    tiles = dynamic_tile(img, image_size=input_size, use_thumbnail=True, max_num=max_num)
    conv = to_tensor_uint8 if as_uint8 else to_tensor_normalized
    return np.stack([conv(t, input_size) for t in tiles])


def char_content_canvas(input_size: int = 448) -> int:
    """Max content edge of a char slice (the [200,350] upper bound, scaled)."""
    return max(2, round(350 * input_size / 448))


def char_canvas_buckets(input_size: int = 448) -> Tuple[int, ...]:
    """Content-canvas buckets for char slices. Scaled content is in
    [200, 350] (load_char_slice semantics), so most chars — anything whose
    max edge lands at the 200 lower bound — fit the smallest bucket, cutting
    host-link bytes ~2.5x vs always shipping the 350 canvas. Every bucket
    keeps (input_size - bucket) even so the on-device outer pad composes
    bit-exactly with the host centering (see load_char_content)."""
    out = []
    for b in (224, 288, 350):
        b = max(2, round(b * input_size / 448))
        if (input_size - b) % 2 != 0:
            b += 1
        out.append(b)
    # dedupe while preserving order (tiny input sizes collapse buckets)
    seen, uniq = set(), []
    for b in out:
        if b not in seen:
            seen.add(b)
            uniq.append(b)
    return tuple(uniq)


def char_content_dims(w: int, h: int, input_size: int = 448) -> Tuple[int, int]:
    """Scaled (nw, nh) of a char crop under the [200,350] rule
    (utils/utils.py:420-452 load_image_2 semantics)."""
    lo = max(1, round(200 * input_size / 448))
    hi = char_content_canvas(input_size)
    m = max(w, h)
    if m <= lo:
        scale = lo / m
    elif m >= hi:
        scale = hi / m
    else:
        scale = 1.0
    return int(w * scale), int(h * scale)


def load_char_content(
    image: ImageLike, input_size: int = 448, canvas: Optional[int] = None
) -> np.ndarray:
    """Bandwidth-lean variant of load_char_slice: the scaled content is
    white-padded only to a content canvas (<= ~350px); the device pads the
    rest of the way to ``input_size`` (models/internvit.pad_char_content).
    Bit-exact with load_char_slice because the outer padding is constant white
    and the centering offsets compose:
    (canvas-n)//2 + (input-canvas)//2 == (input-n)//2 for even input-canvas.
    ``canvas`` defaults to the max content size; pass a char_canvas_buckets
    entry >= the content size to ship fewer bytes. Returns
    (canvas, canvas, 3) uint8."""
    img = open_image(image)
    w, h = img.size
    nw, nh = char_content_dims(w, h, input_size)
    img = img.resize((nw, nh), Image.BICUBIC)
    if canvas is None:
        hi = char_content_canvas(input_size)
        canvas = hi if (input_size - hi) % 2 == 0 else hi + 1
    assert canvas >= max(nw, nh) and (input_size - canvas) % 2 == 0
    img = ImageOps.expand(
        img,
        border=(
            (canvas - nw) // 2,
            (canvas - nh) // 2,
            (canvas - nw + 1) // 2,
            (canvas - nh + 1) // 2,
        ),
        fill=(255, 255, 255),
    )
    return np.asarray(img, np.uint8)


def bucket_tiles(n: int, buckets: Sequence[int] = TILE_BUCKETS) -> int:
    """Smallest bucket >= n (compile-once-per-bucket batching)."""
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]


def pad_to_bucket(tiles: np.ndarray, buckets: Sequence[int] = TILE_BUCKETS) -> Tuple[np.ndarray, int]:
    """Pad tile stack (N,H,W,C) with zeros up to the bucket size. Returns
    (padded, real_count)."""
    n = tiles.shape[0]
    b = bucket_tiles(n, buckets)
    if b == n:
        return tiles, n
    pad = np.zeros((b - n,) + tiles.shape[1:], tiles.dtype)
    return np.concatenate([tiles, pad], axis=0), n
