"""Annotator geometry vs the reference's cv2 semantics.

cv2 is available in this image, so the reference's exact pipelines
(``findContours(RETR_FLOODFILL)`` + ``drawContours``; ``drawContours`` for
face landmark contours) serve as ORACLES here — the shipped code in
``mas_tpu.data.annotate`` / ``segmap`` stays numpy-only.
"""

import numpy as np
import pytest

from mas_tpu.data.annotate import (FACE_CLASS_RANGES, draw_face_mask,
                                   faces_to_mask, masks_to_boxes,
                                   panoptic_thing_boxes)
from mas_tpu.data.segmap import edges_from_instances

cv2 = pytest.importorskip("cv2")


# --- masks_to_boxes (detectron2_preprocessor.py:16-29) ----------------------

def _torch_reference_boxes(masks):
    """Literal semantics of the reference loop, in numpy."""
    out = np.zeros((masks.shape[0], 4), np.float32)
    for i, mask in enumerate(masks):
        y, x = np.where(mask != 0)
        if len(x) == 0:
            continue   # reference would crash; we pin the zero-row behavior
        out[i] = [x.min(), y.min(), x.max(), y.max()]
    return out


def test_masks_to_boxes_matches_reference_loop():
    r = np.random.default_rng(0)
    masks = (r.random((5, 24, 31)) > 0.92)
    masks[3] = False                       # empty mask -> zero row
    np.testing.assert_array_equal(masks_to_boxes(masks),
                                  _torch_reference_boxes(masks))


def test_masks_to_boxes_empty_input():
    assert masks_to_boxes(np.zeros((0, 8, 8))).shape == (0, 4)


def test_panoptic_thing_boxes():
    pan = np.zeros((20, 20), np.int64)
    pan[2:8, 3:9] = 7 * 1000 + 1          # thing (class 7)
    pan[10:15, 10:18] = 79 * 1000 + 2     # thing (class 79, boundary)
    pan[0:2, 0:20] = 90 * 1000            # stuff (class 90) — excluded
    boxes = panoptic_thing_boxes(pan)
    # background id 0 (class 0) counts as a thing in the reference's
    # `obj_ids/1000 < 80` filter — preserved: first box covers the frame
    assert boxes.shape == (3, 4)
    np.testing.assert_array_equal(boxes[1], [3, 2, 8, 7])
    np.testing.assert_array_equal(boxes[2], [10, 10, 17, 14])


# --- edges (edge_extractor.py:7-17) -----------------------------------------

def _cv2_reference_edges(mask):
    edges = np.zeros(mask.shape)
    contours, _ = cv2.findContours(mask.astype(np.int32),
                                   cv2.RETR_FLOODFILL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    return cv2.drawContours(edges, contours, -1, 1, 1)


@pytest.mark.parametrize("seed", [0, 1])
def test_edges_match_cv2_floodfill_on_rectangles(seed):
    """On interior axis-aligned instance layouts the two are
    pixel-identical (at the image frame cv2 additionally marks border
    pixels of regions touching the frame — covered by the blob test)."""
    r = np.random.default_rng(seed)
    m = np.zeros((32, 32), np.int64)
    for inst in range(1, 4):
        y, x = r.integers(1, 18, 2)
        h, w = r.integers(4, 10, 2)
        m[y:y + h, x:x + w] = inst * 1000 + inst
    ref = _cv2_reference_edges(m) > 0
    ours = edges_from_instances(m) > 0
    np.testing.assert_array_equal(ours, ref)


def test_edges_close_to_cv2_floodfill_on_blobs():
    """On curved blobs cv2's contour tracing and the 4-neighbor boundary
    detector may differ at single diagonal pixels; require IoU >= 0.85 and
    that every cv2 edge pixel is within 1 px of one of ours."""
    yy, xx = np.mgrid[0:48, 0:48]
    m = np.zeros((48, 48), np.int64)
    m[(yy - 20) ** 2 + (xx - 20) ** 2 < 130] = 1001
    m[(yy - 34) ** 2 + ((xx - 36) * 1.3) ** 2 < 80] = 2002
    ref = (_cv2_reference_edges(m) > 0)
    ours = (edges_from_instances(m) > 0)
    iou = (ref & ours).sum() / (ref | ours).sum()
    assert iou >= 0.85, iou
    grown = np.zeros_like(ours)
    grown |= ours
    grown[1:] |= ours[:-1]; grown[:-1] |= ours[1:]
    grown[:, 1:] |= ours[:, :-1]; grown[:, :-1] |= ours[:, 1:]
    assert not (ref & ~grown).any()


# --- face landmark contours (face_alignment_preprocessor.py:103-133) --------

def _cv2_reference_face(mask, face):
    """Literal reference draw_interpolated_face."""
    for class_id, (start, stop) in FACE_CLASS_RANGES.items():
        if class_id not in (3, 1):        # EYE, BROW
            cv2.drawContours(mask, [face[start:stop]], 0, class_id + 1, 1)
        else:
            step = (stop - start) // 2
            cv2.drawContours(mask, [face[start:start + step]], 0,
                             class_id + 1, 1)
            cv2.drawContours(mask, [face[start + step:stop]], 0,
                             class_id + 1, 1)
    return mask


def _synthetic_landmarks(rng, h=96, w=96):
    """Plausible 68-point layout: jaw arc, brows, nose, eyes, mouth."""
    t = np.linspace(0, np.pi, 17)
    jaw = np.stack([48 + 30 * np.cos(np.pi - t), 40 + 35 * np.sin(t)], 1)
    brow_l = np.stack([np.linspace(28, 42, 5), np.full(5, 30.0)], 1)
    brow_r = np.stack([np.linspace(54, 68, 5), np.full(5, 30.0)], 1)
    nose = np.stack([np.full(9, 48.0) + rng.normal(0, 1, 9),
                     np.linspace(34, 52, 9)], 1)
    a = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    eye_l = np.stack([36 + 5 * np.cos(a), 38 + 3 * np.sin(a)], 1)
    eye_r = np.stack([60 + 5 * np.cos(a), 38 + 3 * np.sin(a)], 1)
    a = np.linspace(0, 2 * np.pi, 20, endpoint=False)
    mouth = np.stack([48 + 9 * np.cos(a), 62 + 5 * np.sin(a)], 1)
    pts = np.concatenate([jaw, brow_l, brow_r, nose, eye_l, eye_r, mouth])
    return pts + rng.normal(0, 0.8, pts.shape)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_face_mask_close_to_cv2(seed):
    rng = np.random.default_rng(seed)
    face = _synthetic_landmarks(rng).astype(np.int64)
    ours = draw_face_mask(np.zeros((96, 96), np.uint8), face)
    ref = _cv2_reference_face(np.zeros((96, 96), np.uint8),
                              face.astype(np.int32))
    # line rasterizers may disagree on isolated diagonal pixels; demand
    # high overlap and identical label sets
    agree = ((ours > 0) & (ref > 0)).sum()
    union = ((ours > 0) | (ref > 0)).sum()
    assert agree / union >= 0.80, agree / union
    assert set(np.unique(ours)) == set(np.unique(ref))
    # class separation: eyes drawn as two disconnected contours
    eye = (ours == 4).astype(np.uint8)
    n_components, _ = cv2.connectedComponents(eye)
    assert n_components - 1 == 2


def test_faces_to_mask_multiple_faces():
    rng = np.random.default_rng(3)
    f1 = _synthetic_landmarks(rng)
    f2 = _synthetic_landmarks(rng) + np.array([80.0, 60.0])  # partly offframe
    mask = faces_to_mask((128, 160), np.stack([f1, f2]))
    assert mask.shape == (128, 160)
    assert mask.max() == 5 and (mask > 0).sum() > 100


def test_draw_contour_clips_out_of_frame():
    mask = np.zeros((10, 10), np.uint8)
    pts = np.array([[-5, -5], [15, 2], [5, 15]])
    from mas_tpu.data.annotate import draw_closed_contour
    draw_closed_contour(mask, pts, 7)      # must not raise
    assert (mask == 7).any()


# --- human-parts transform chain (human_parts_preprocessor.py:78-101) -------

def _torch_resize(x, size, align_corners):
    import torch
    import torch.nn.functional as F

    return F.interpolate(torch.from_numpy(np.asarray(x, np.float32)),
                         size=size, mode="bilinear",
                         align_corners=align_corners).numpy()


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("shape", [(37, 53, 96, 96), (37, 53, 17, 29)])
def test_bilinear_resize_matches_torch(align_corners, shape):
    pytest.importorskip("torch")
    from mas_tpu.data.annotate import bilinear_resize

    in_h, in_w, out_h, out_w = shape
    x = np.random.default_rng(0).random((2, 3, in_h, in_w)).astype(np.float32)
    ours = bilinear_resize(x, out_h, out_w, align_corners=align_corners)
    ref = _torch_resize(x, (out_h, out_w), align_corners)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_prepare_human_input_matches_torch_chain():
    torch = pytest.importorskip("torch")
    from mas_tpu.data.annotate import (HUMAN_PARTS_INPUT_SIZE,
                                       HUMAN_PARTS_MEAN, HUMAN_PARTS_STD,
                                       prepare_human_input)

    rng = np.random.default_rng(1)
    imgs = (rng.random((2, 3, 64, 48)) * 255).astype(np.float32)
    ours = prepare_human_input(imgs)
    # literal reference chain (human_parts_preprocessor.py:90-92)
    t = _torch_resize(imgs, HUMAN_PARTS_INPUT_SIZE, align_corners=False)
    ref = ((t / 255.0 - HUMAN_PARTS_MEAN[:, None, None])
           / HUMAN_PARTS_STD[:, None, None])
    assert ours.shape == (2, 3, 473, 473)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_human_logits_to_mask_matches_torch_chain():
    torch = pytest.importorskip("torch")
    from mas_tpu.data.annotate import (HUMAN_PARTS_INPUT_SIZE,
                                       human_logits_to_mask)

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 20, 119, 119)).astype(np.float32)
    h, w = 70, 90
    ours = human_logits_to_mask(logits, h, w)
    # reference: Upsample(473, align_corners=True) -> resize(h, w) -> argmax
    # (human_parts_preprocessor.py:96-100)
    up = _torch_resize(logits, HUMAN_PARTS_INPUT_SIZE, align_corners=True)
    back = _torch_resize(up, (h, w), align_corners=False)
    ref = np.argmax(back, axis=1)
    assert ours.shape == (2, h, w) and ours.dtype == np.uint8
    # argmax can flip on float ties near region borders; demand near-exact
    assert (ours == ref).mean() > 0.999
