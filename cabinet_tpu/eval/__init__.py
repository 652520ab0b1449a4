from cabinet_tpu.eval.evaluator import MscEval, compute_metrics
from cabinet_tpu.eval.metrics import confusion_matrix

__all__ = ["MscEval", "compute_metrics", "confusion_matrix"]
