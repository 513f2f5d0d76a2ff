from unmore_tpu.evaluation.coco_eval import COCOMetrics, evaluate_ap
