from vec_vad_tpu.eval.metrics import (  # noqa: F401
    roc_curve,
    precision_recall_curve,
    auc,
    roc_auc_score,
    evaluate_scores,
    save_roc_pr_curve_data,
)
