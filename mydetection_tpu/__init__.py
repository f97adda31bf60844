"""mydetection_tpu — TPU-native object-detection framework in JAX.

A ground-up rebuild of the capabilities of duanzhiihao/myDetection
(PyTorch reference) designed for TPU: the whole
preprocess→backbone→head→decode→top-k→NMS path compiles to one XLA
graph per input-size bucket, with static-shape padded post-processing
(Pallas kernels on the hot ops) instead of the reference's host-side
Python loops. See SURVEY.md for the blueprint.

Public surface (reference parity, SURVEY.md §2.1/§2.2):
    Detector(model_name=..., weights_path=...)  — build-by-name
    Detector.detect_one / detect_batch / detect_imgSeq
    get_model(name) / list_models()
    evaluate_coco(...)  — COCO box-mAP evaluation
"""

from mydetection_tpu.api import Detections, Detector
from mydetection_tpu.registry import Model, ModelConfig, get_model, list_models


def evaluate_coco(detector, ann_file, img_dir, **kw):
    """COCO box-mAP evaluation of a Detector (lazy import)."""
    from mydetection_tpu.eval.evaluator import evaluate_detector

    return evaluate_detector(detector, ann_file, img_dir, **kw)


def __getattr__(name):
    # AOT serving artifact surface, lazily bound (pulls in jax.export)
    if name in ("export_detector", "load_exported", "ExportedDetector"):
        from mydetection_tpu import export as _export

        return getattr(_export, name)
    if name == "DetectionServer":  # HTTP serving daemon (serve.py)
        from mydetection_tpu.serve import DetectionServer

        return DetectionServer
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "DetectionServer",
    "Detections",
    "Detector",
    "ExportedDetector",
    "Model",
    "ModelConfig",
    "evaluate_coco",
    "export_detector",
    "get_model",
    "list_models",
    "load_exported",
]

__version__ = "0.1.0"
