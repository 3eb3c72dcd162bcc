"""mAP calculator protocol tests (vs hand-computed fixtures and the
reference's matching semantics)."""

import numpy as np

from fasterrcnn_tpu.data.voc import Box
from fasterrcnn_tpu.utils.stats import PrecisionRecallCurveCalculator, TrainingStatistics


def gt(cls, y1, x1, y2, x2):
    return Box(class_index=cls, class_name=str(cls), corners=np.array([y1, x1, y2, x2], np.float32))


def test_perfect_detection_gives_map_1():
    calc = PrecisionRecallCurveCalculator()
    boxes = [gt(1, 10, 10, 100, 100), gt(2, 200, 200, 300, 320)]
    calc.add_image_results(
        {
            1: np.array([[10, 10, 100, 100, 0.9]]),
            2: np.array([[200, 200, 300, 320, 0.8]]),
        },
        boxes,
    )
    assert calc.compute_mean_average_precision() == 1.0


def test_false_positive_halves_precision():
    calc = PrecisionRecallCurveCalculator()
    boxes = [gt(1, 10, 10, 100, 100)]
    # One TP at score .9 and one FP at score .95 (scores descending order).
    calc.add_image_results(
        {1: np.array([[500, 500, 550, 550, 0.95], [10, 10, 100, 100, 0.9]])},
        boxes,
    )
    # AP: precision at recall 1 is 1/2 -> AP = 0.5.
    assert abs(calc.compute_mean_average_precision() - 0.5) < 1e-9


def test_duplicate_detection_counts_fp():
    calc = PrecisionRecallCurveCalculator()
    boxes = [gt(1, 10, 10, 100, 100)]
    calc.add_image_results(
        {1: np.array([[10, 10, 100, 100, 0.9], [12, 12, 100, 100, 0.8]])},
        boxes,
    )
    aps = calc.compute_average_precisions()
    assert abs(aps[1] - 1.0) < 1e-9  # TP first at full recall -> AP 1
    # but only one TP: second is FP; precision at the FP point doesn't affect AP
    preds = calc._predictions[1]
    assert sum(1 for _, c in preds if c) == 1


def test_low_iou_is_fp():
    calc = PrecisionRecallCurveCalculator()
    boxes = [gt(1, 0, 0, 100, 100)]
    calc.add_image_results({1: np.array([[60, 60, 160, 160, 0.9]])}, boxes)
    assert calc.compute_mean_average_precision() == 0.0


def test_map_averages_only_classes_with_objects():
    calc = PrecisionRecallCurveCalculator()
    boxes = [gt(3, 10, 10, 100, 100)]
    calc.add_image_results(
        {3: np.array([[10, 10, 100, 100, 0.9]]), 7: np.array([[0, 0, 50, 50, 0.4]])},
        boxes,
    )
    aps = calc.compute_average_precisions()
    assert set(aps) == {3}
    assert calc.compute_mean_average_precision() == 1.0


def test_training_statistics_running_mean():
    class L:
        rpn_class = 1.0
        rpn_regression = 2.0
        detector_class = 3.0
        detector_regression = 4.0

    stats = TrainingStatistics()
    stats.on_training_step(L())
    stats.on_training_step(L())
    m = stats.means()
    assert m["rpn_class"] == 1.0 and m["detector_regression"] == 4.0
    postfix = stats.get_progbar_postfix()
    assert postfix["total_loss"] == "10.00"
