from waveformer_tpu.metrics.segmentation import (  # noqa: F401
    ConfusionStats,
    brats_case_metrics,
    cal_metric,
    convert_labels_brats,
    dice,
    dice_jax,
    hausdorff_distance_95,
    multiclass_case_metrics,
    surface_distances,
)
