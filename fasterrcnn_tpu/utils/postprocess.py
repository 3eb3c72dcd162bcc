"""Convert fixed-shape device Detections into the reference's host format.

The reference predict() returns Dict[class_index -> (N, 5) ndarray of
(y1, x1, y2, x2, score)] (faster_rcnn.py:135-226). The device side here emits
padded (B, C-1, D, ...) tensors; this module strips padding per image.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def detections_to_dicts(detections) -> List[Dict[int, np.ndarray]]:
    """(B, C-1, D) padded Detections -> per-image dicts keyed by class index.

    Classes with zero surviving detections are present with empty arrays,
    matching the reference's behavior of always populating every class key
    at predict time (faster_rcnn.py:187-211).
    """
    boxes = np.asarray(detections.boxes)
    scores = np.asarray(detections.scores)
    valid = np.asarray(detections.valid) > 0
    b, num_fg, _, _ = boxes.shape
    out = []
    for i in range(b):
        per_class = {}
        for c in range(num_fg):
            live = valid[i, c]
            scored = np.concatenate(
                [boxes[i, c][live], scores[i, c][live][:, None]], axis=1
            )
            per_class[c + 1] = scored  # class indices are 1-based (0 = bg)
        out.append(per_class)
    return out
