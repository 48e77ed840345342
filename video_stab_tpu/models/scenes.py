"""Synthetic traffic-scene renderer: structured training/eval data for the
detector + tracker stack.

The reference ships TrafficCamNet weights trained on real traffic footage
(include/video/DeepStreamTracker.h:50-52); no labeled real data exists in
this environment, so the framework bundles weights trained on these
procedurally rendered scenes — cars, bicycles, people and roadsigns with
internal structure (windows, wheels, limbs) over textured road scenes —
and a quality gate (tests/test_models.py) asserting recall/precision on
held-out scenes plus stable track IDs on a rendered clip. Swapping in real
data is a data change, not a code change: `render_scene` returns the same
(frame, boxes) contract a COCO/KITTI loader would.

Classes match TRAFFICCAMNET_LABELS: car=0, bicycle=1, person=2, roadsign=3.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = ["render_scene", "render_clip", "make_detection_batch"]


def _clip_int(v, lo, hi):
    return int(max(lo, min(hi, v)))


def _draw_car(img, rng, cx, cy, scale):
    """Side-view car: body, cabin, windows, two wheels. Returns bbox."""
    import cv2
    w = int(44 * scale)
    h = int(18 * scale)
    cab_h = int(10 * scale)
    wheel_r = max(2, int(4 * scale))
    color = tuple(int(c) for c in rng.integers(60, 255, 3))
    dark = tuple(int(c * 0.35) for c in color)
    x0, y0 = int(cx - w / 2), int(cy - h / 2)
    # body
    cv2.rectangle(img, (x0, y0 + cab_h // 2), (x0 + w, y0 + h), color, -1)
    # cabin
    cv2.rectangle(img, (x0 + w // 5, y0), (x0 + 4 * w // 5, y0 + cab_h),
                  color, -1)
    # windows
    win = tuple(int(c) for c in rng.integers(140, 220, 3))
    cv2.rectangle(img, (x0 + w // 4, y0 + 1), (x0 + w // 2 - 1, y0 + cab_h - 1),
                  win, -1)
    cv2.rectangle(img, (x0 + w // 2 + 1, y0 + 1),
                  (x0 + 3 * w // 4, y0 + cab_h - 1), win, -1)
    # wheels
    wy = y0 + h
    cv2.circle(img, (x0 + w // 4, wy), wheel_r, (25, 25, 25), -1)
    cv2.circle(img, (x0 + 3 * w // 4, wy), wheel_r, (25, 25, 25), -1)
    cv2.circle(img, (x0 + w // 4, wy), max(1, wheel_r // 2), dark, -1)
    cv2.circle(img, (x0 + 3 * w // 4, wy), max(1, wheel_r // 2), dark, -1)
    return (x0, y0, w, h + wheel_r)


def _draw_person(img, rng, cx, cy, scale):
    import cv2
    h = int(26 * scale)
    w = max(4, int(8 * scale))
    color = tuple(int(c) for c in rng.integers(40, 230, 3))
    skin = (140, 170, 210)
    head_r = max(2, int(3.5 * scale))
    x0, y0 = int(cx - w / 2), int(cy - h / 2)
    cv2.circle(img, (int(cx), y0 + head_r), head_r, skin, -1)
    cv2.rectangle(img, (x0, y0 + 2 * head_r), (x0 + w, y0 + int(h * 0.65)),
                  color, -1)
    leg = tuple(int(c * 0.6) for c in color)
    lw = max(1, w // 3)
    cv2.rectangle(img, (x0, y0 + int(h * 0.65)), (x0 + lw, y0 + h), leg, -1)
    cv2.rectangle(img, (x0 + w - lw, y0 + int(h * 0.65)), (x0 + w, y0 + h),
                  leg, -1)
    return (x0, y0 - head_r // 2, w, h + head_r // 2)


def _draw_bicycle(img, rng, cx, cy, scale):
    import cv2
    r = max(3, int(6 * scale))
    gap = int(16 * scale)
    color = tuple(int(c) for c in rng.integers(60, 255, 3))
    y = int(cy + r // 2)
    x1, x2 = int(cx - gap / 2), int(cx + gap / 2)
    cv2.circle(img, (x1, y), r, (30, 30, 30), 1 + int(scale))
    cv2.circle(img, (x2, y), r, (30, 30, 30), 1 + int(scale))
    cv2.line(img, (x1, y), (int(cx), y - r), color, 1 + int(scale))
    cv2.line(img, (x2, y), (int(cx), y - r), color, 1 + int(scale))
    cv2.line(img, (int(cx), y - r), (int(cx - gap / 4), y - r - r // 2),
             color, 1 + int(scale))
    x0 = x1 - r
    y0 = y - r - int(r * 1.5)
    return (x0, y0, gap + 2 * r, 2 * r + int(r * 1.5))


def _draw_roadsign(img, rng, cx, cy, scale):
    import cv2
    r = max(3, int(6 * scale))
    pole_h = int(14 * scale)
    col = [(60, 60, 230), (230, 140, 40), (60, 200, 230)][
        int(rng.integers(0, 3))]
    cv2.line(img, (int(cx), int(cy)), (int(cx), int(cy + pole_h)),
             (90, 90, 90), 1 + int(scale * 0.7))
    cv2.circle(img, (int(cx), int(cy)), r, col, -1)
    cv2.circle(img, (int(cx), int(cy)), r, (250, 250, 250), 1)
    return (int(cx - r), int(cy - r), 2 * r, 2 * r + pole_h)


_DRAWERS = (_draw_car, _draw_bicycle, _draw_person, _draw_roadsign)


def _background(rng, h, w):
    """Sky gradient + road plane + lane dashes + texture noise."""
    import cv2
    horizon = int(h * rng.uniform(0.25, 0.5))
    sky_top = rng.integers(120, 240, 3).astype(np.float32)
    sky_bot = sky_top * rng.uniform(0.6, 0.95)
    road = rng.uniform(70, 120)
    img = np.zeros((h, w, 3), np.float32)
    t = (np.arange(horizon, dtype=np.float32) / max(horizon - 1, 1))[:, None,
                                                                     None]
    img[:horizon] = sky_top * (1 - t) + sky_bot * t
    shade = (np.arange(h - horizon, dtype=np.float32)
             / max(h - horizon - 1, 1))[:, None, None]
    img[horizon:] = road * (0.8 + 0.4 * shade)
    # lane markings
    lane_y = horizon + int((h - horizon) * rng.uniform(0.3, 0.8))
    for x in range(0, w, 30):
        cv2.line(img, (x, lane_y), (x + 14, lane_y),
                 (220.0, 220.0, 220.0), 2)
    img += rng.normal(0, 6, (h, w, 3)).astype(np.float32)
    return img, horizon


_PHOTO_CACHE: Optional[list] = None


def photo_backgrounds() -> list:
    """Real photographs available OFFLINE from installed packages —
    matplotlib's grace_hopper.jpg (a public-domain US Navy photograph),
    pygame's documentation webcam captures and intro photos, scikit-learn's
    sample photos (china.jpg — an outdoor architecture/street scene — and
    flower.jpg), and labmaze's naturalistic skybox panoramas (12 horizon
    faces across 3 sky sets — outdoor sky/cloud imagery). Used to validate
    the learned components on photographic (non-rendered) imagery (the
    reference's TrafficCamNet default is a real-data model,
    DeepStreamTracker.h:46-52). Returns a list of BGR uint8 images
    (~22 distinct backgrounds when all packages are present); empty when
    no package ships them."""
    global _PHOTO_CACHE
    if _PHOTO_CACHE is not None:
        return _PHOTO_CACHE
    import glob
    import os

    import cv2
    paths = []
    try:
        import matplotlib
        paths.append(os.path.join(os.path.dirname(matplotlib.__file__),
                                  "mpl-data", "sample_data",
                                  "grace_hopper.jpg"))
    except ImportError:
        pass
    try:
        os.environ.setdefault("PYGAME_HIDE_SUPPORT_PROMPT", "1")
        import pygame
        img_dir = os.path.join(os.path.dirname(pygame.__file__), "docs",
                               "generated", "_images")
        pat = os.path.join(img_dir, "camera_*.jpg")
        keep = ("rgb", "average", "background", "yuv", "hsv")
        paths += [p for p in sorted(glob.glob(pat))
                  if any(k in os.path.basename(p) for k in keep)]
        paths += sorted(glob.glob(os.path.join(img_dir, "intro_*.jpg")))
    except ImportError:
        pass
    try:
        import sklearn.datasets
        img_dir = os.path.join(os.path.dirname(sklearn.datasets.__file__),
                               "images")
        paths += sorted(glob.glob(os.path.join(img_dir, "*.jpg")))
    except ImportError:
        pass
    try:
        import labmaze.assets
        asset_dir = os.path.dirname(labmaze.assets.__file__)
        for sky in sorted(glob.glob(os.path.join(asset_dir, "sky_*"))):
            # Horizon-facing skybox faces only (bk/ft/lf/rt): outdoor
            # sky/cloud panoramas; dn/up are ground/zenith tiles.
            paths += [os.path.join(sky, f + ".png")
                      for f in ("bk", "ft", "lf", "rt")]
    except ImportError:
        pass
    imgs = []
    for p in paths:
        img = cv2.imread(p)
        if img is not None and min(img.shape[:2]) >= 120:
            imgs.append(img)
    _PHOTO_CACHE = imgs
    return imgs


def _photo_background(rng, h, w):
    """Photographic background: random crop of a bundled real photo,
    resized to (h, w) with photometric jitter. Horizon fixed at 0.35h so
    object placement matches the rendered-scene convention."""
    import cv2
    photos = photo_backgrounds()
    if not photos:                      # packages absent: fall back
        return _background(rng, h, w)
    img = photos[int(rng.integers(0, len(photos)))]
    ih, iw = img.shape[:2]
    ch = int(ih * rng.uniform(0.6, 1.0))
    cw = min(iw, max(int(ch * w / h), 32))
    ch = min(ih, max(int(cw * h / w), 32))
    y0 = int(rng.integers(0, ih - ch + 1))
    x0 = int(rng.integers(0, iw - cw + 1))
    crop = img[y0:y0 + ch, x0:x0 + cw]
    if rng.random() < 0.5:
        crop = crop[:, ::-1]
    out = cv2.resize(crop.astype(np.float32), (w, h),
                     interpolation=cv2.INTER_AREA)
    out = out * rng.uniform(0.7, 1.1) + rng.uniform(-10, 10)
    return out, int(h * 0.35)


def _draw_distractors(img, rng, horizon, h, w):
    """Unlabeled clutter: object-sized natural shapes (bush blobs, rock
    ellipses, sign posts, road stains) that a loose detector fires on —
    a precision stressor. Drawn UNDER no ground-truth box."""
    import cv2
    n = int(rng.integers(1, 4))
    for _ in range(n):
        cx = float(rng.uniform(15, w - 15))
        cy = float(rng.uniform(horizon + 5, h - 10))
        s = float(rng.uniform(8, 28))
        kind = int(rng.integers(0, 4))
        col = tuple(float(c) for c in rng.uniform(30, 150, 3))
        if kind == 0:                       # bush: cluster of ellipses
            for _ in range(4):
                ox, oy = rng.uniform(-s / 2, s / 2, 2)
                cv2.ellipse(img, (int(cx + ox), int(cy + oy)),
                            (int(s / 2), int(s / 3)), 0, 0, 360, col, -1)
        elif kind == 1:                     # rock
            cv2.ellipse(img, (int(cx), int(cy)), (int(s), int(s * 0.6)),
                        float(rng.uniform(-20, 20)), 0, 360, col, -1)
        elif kind == 2:                     # sign post
            cv2.rectangle(img, (int(cx - 1), int(cy - s * 1.5)),
                          (int(cx + 1), int(cy)), (90, 90, 90), -1)
            cv2.rectangle(img, (int(cx - s / 3), int(cy - s * 1.9)),
                          (int(cx + s / 3), int(cy - s * 1.4)), col, -1)
        else:                               # road stain
            cv2.ellipse(img, (int(cx), int(cy)), (int(s * 1.3), int(s / 3)),
                        0, 0, 360, tuple(v * 0.6 for v in col), -1)


def render_scene(rng: np.random.Generator, h: int = 192, w: int = 320,
                 n_objects: Optional[int] = None,
                 classes: Tuple[int, ...] = (0, 1, 2, 3),
                 background: str = "rendered",
                 hard: bool = False,
                 ) -> Tuple[np.ndarray, List[Tuple[int, float, float, float,
                                                   float]]]:
    """One scene. Returns (frame u8 BGR (h,w,3), boxes) where boxes are
    (class_id, x, y, bw, bh) in pixels. background="photo" composites the
    rendered objects onto a real photograph (photo_backgrounds).

    hard=True is the adversarial eval/training variant (VERDICT r4 #6):
    distractor clutter (unlabeled object-sized shapes), a wider object
    scale range, stronger brightness/contrast jitter, heavier blur, and
    sensor noise."""
    import cv2
    if background == "photo":
        img, horizon = _photo_background(rng, h, w)
    else:
        img, horizon = _background(rng, h, w)
    if hard:
        _draw_distractors(img, rng, horizon, h, w)
    n = int(rng.integers(1, 5)) if n_objects is None else n_objects
    boxes = []
    for _ in range(n):
        cls = int(rng.choice(classes))
        scale = float(rng.uniform(0.55, 2.6) if hard
                      else rng.uniform(0.7, 2.2))
        cx = float(rng.uniform(30, w - 30))
        cy = float(rng.uniform(horizon + 5, h - 25))
        bbox = _DRAWERS[cls](img, rng, cx, cy, scale)
        x, y, bw, bh = bbox
        # keep boxes that are mostly inside the frame
        if x < -bw * 0.2 or y < -bh * 0.2 or x + bw > w * 1.05 \
                or y + bh > h * 1.05 or bw < 6 or bh < 6:
            continue
        boxes.append((cls, float(x), float(y), float(bw), float(bh)))
    # photometric jitter
    if hard:
        img = (img - 128.0) * rng.uniform(0.75, 1.25) + 128.0
        img = img * rng.uniform(0.6, 1.3) + rng.uniform(-18, 18)
        if rng.random() < 0.5:
            img = cv2.GaussianBlur(img, (0, 0), float(rng.uniform(0.5, 1.3)))
        img = img + rng.normal(0.0, rng.uniform(1.0, 5.0), img.shape)
    else:
        img = img * rng.uniform(0.8, 1.15) + rng.uniform(-12, 12)
        if rng.random() < 0.3:
            img = cv2.GaussianBlur(img, (3, 3), 0)
    return np.clip(img, 0, 255).astype(np.uint8), boxes


def render_clip(rng: np.random.Generator, n_frames: int = 60, h: int = 192,
                w: int = 320, n_objects: int = 2,
                classes: Tuple[int, ...] = (0,),
                background: str = "rendered",
                pan_px_per_frame: float = 0.0,
                occluder: bool = False):
    """A clip with objects moving at constant velocity — ground truth for
    tracker tests (stable IDs). Returns (frames, per-frame boxes).
    background="photo" uses a real photograph; pan_px_per_frame slides the
    camera window across a wider backdrop (a photographic pan);
    occluder=True plants a vertical pole band mid-scene (world coords)
    drawn OVER the objects, so moving objects pass behind it and the
    tracker must coast through the occlusion (max_lost_age semantics)."""
    import cv2
    base_rng = np.random.default_rng(int(rng.integers(0, 2 ** 31)))
    pan_total = int(abs(pan_px_per_frame) * n_frames + 0.5)
    world_w = w + pan_total
    if background == "photo":
        bg, horizon = _photo_background(base_rng, h, world_w)
    else:
        bg, horizon = _background(base_rng, h, world_w)
    objs = []
    for _ in range(n_objects):
        cls = int(rng.choice(classes))
        scale = float(rng.uniform(1.0, 1.8))
        cy = float(rng.uniform(horizon + 15, h - 30))
        going_right = bool(rng.random() < 0.5)
        cx = 40.0 if going_right else w - 40.0
        vx = float(rng.uniform(1.0, 2.5)) * (1 if going_right else -1)
        seed = int(rng.integers(0, 2 ** 31))
        objs.append([cls, cx, cy, vx, scale, seed])
    # Plant the pole band (world coords) where the FIRST object will be at
    # the clip midpoint, sized for a SHORT full occlusion (~4 frames at
    # the object's world-crossing speed) — long enough that detections
    # really drop, short enough that a coasting tracker (max_lost_age)
    # can re-associate on re-emergence.
    mid_t = n_frames // 2
    pan_v = pan_px_per_frame if pan_px_per_frame > 0 else 0.0
    occ_x = int(objs[0][1] + objs[0][3] * mid_t + pan_v * mid_t)
    bw0 = 44 * objs[0][4]               # car body width at objs[0] scale
    speed = abs(objs[0][3] + pan_v)
    # Wider than the car by ~4 frames of travel: the GT-blank frames below
    # must be GENUINELY fully hidden, or the detector keeps firing on the
    # visible fragments and the tracker never actually coasts (the contract
    # the occlusion tests exist to exercise).
    occ_w = int(bw0 * 1.25 + 4 * max(speed, 1.0))
    occ_col = tuple(float(c) for c in base_rng.integers(35, 90, 3))
    frames, all_boxes = [], []
    for t in range(n_frames):
        win_x = int(pan_px_per_frame * t) if pan_px_per_frame > 0 else 0
        img = bg.copy()
        boxes = []
        for cls, cx, cy, vx, scale, seed in objs:
            obj_rng = np.random.default_rng(seed)   # stable appearance
            x = cx + vx * t + win_x     # keep the object in the pan window
            if 20 < x - win_x < w - 20:
                bbox = _DRAWERS[cls](img, obj_rng, x, cy, scale)
                bx, by, bw_, bh_ = bbox
                # Fully-occluded objects are no longer ground truth for
                # that frame (the detector cannot see them). Strict
                # containment: a box allowed to protrude would leave car
                # fragments visible on "occluded" frames.
                if occluder and bx >= occ_x - occ_w // 2 \
                        and bx + bw_ <= occ_x + occ_w // 2:
                    continue
                boxes.append((cls, float(bx - win_x), float(by),
                              float(bw_), float(bh_)))
        if occluder:
            cv2.rectangle(img, (occ_x - occ_w // 2, 0),
                          (occ_x + occ_w // 2, h), occ_col, -1)
            cv2.line(img, (occ_x, 0), (occ_x, h),
                     tuple(c * 1.4 for c in occ_col), 2)
        img = img[:, win_x:win_x + w]
        img = img + base_rng.normal(0, 2, (h, w, 3))
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
        all_boxes.append(boxes)
    return frames, all_boxes


def make_detection_batch(rng: np.random.Generator, batch: int, height: int,
                         width: int, num_classes: int,
                         photo_prob: float = 0.0,
                         hard_prob: float = 0.0):
    """Rendered scenes + CenterNet targets (drop-in for
    train.synthetic_detection_batch, same contract). photo_prob mixes in
    scenes composited onto real photographic backgrounds (domain
    robustness — the bundled weights fine-tune with photo_prob=0.5);
    hard_prob mixes in the adversarial hard variant (distractor clutter +
    heavy photometric jitter) so precision survives clutter."""
    from video_stab_tpu.models.detector import STRIDE

    hs, ws = height // STRIDE, width // STRIDE
    frames = np.zeros((batch, height, width, 3), np.float32)
    heat = np.zeros((batch, hs, ws, num_classes), np.float32)
    size = np.zeros((batch, hs, ws, 2), np.float32)
    offset = np.zeros((batch, hs, ws, 2), np.float32)
    mask = np.zeros((batch, hs, ws, 1), np.float32)
    yy, xx = np.mgrid[0:hs, 0:ws]
    for b in range(batch):
        bg = "photo" if rng.random() < photo_prob else "rendered"
        frame, boxes = render_scene(rng, height, width, background=bg,
                                    hard=rng.random() < hard_prob)
        frames[b] = frame.astype(np.float32)
        for cls, x, y, bw, bh in boxes:
            gx = (x + bw / 2) / STRIDE
            gy = (y + bh / 2) / STRIDE
            ix, iy = int(gx), int(gy)
            if not (0 <= ix < ws and 0 <= iy < hs):
                continue
            sigma = max(1.0, min(bw, bh) / STRIDE / 6.0)
            g = np.exp(-((xx - gx) ** 2 + (yy - gy) ** 2) / (2 * sigma ** 2))
            heat[b, :, :, cls] = np.maximum(heat[b, :, :, cls], g)
            # CenterNet convention: the center pixel is an EXACT 1.0 —
            # the focal loss's positive set is {target >= 0.999}, and a
            # fractional-center gaussian peaks below it.
            heat[b, iy, ix, cls] = 1.0
            size[b, iy, ix] = (bw / STRIDE, bh / STRIDE)
            offset[b, iy, ix] = (gx - ix, gy - iy)
            mask[b, iy, ix] = 1.0
    return frames, {"heatmap": heat, "size": size, "offset": offset,
                    "mask": mask}
