"""Model summary: parameter counts pin the reference geometry."""

from mydetection_tpu.summary import summarize


def test_yolov3_param_count_matches_reference():
    # published Darknet YOLOv3: ~62.0 M parameters (incl. BN stats our
    # trees carry). A geometry drift (channel widths, missing block)
    # moves this by >0.5 M.
    info = summarize("yolov3", input_size=64)
    assert abs(info["params"] / 1e6 - 62.0) < 0.6, info["params"]
    assert set(info["params_by_module"]) == {"backbone", "head"}
    assert info["gflops_per_image"] and info["gflops_per_image"] > 1.0


def test_summary_runs_for_every_family():
    for name in ("retinanet", "fcos", "rapid"):
        info = summarize(name, input_size=64)
        assert info["params"] > 1e6, (name, info)
