from unmore_tpu.ops.image import (
    resize_bilinear,
    resize_nearest,
    crop_and_resize,
    image_gradients,
)
from unmore_tpu.ops.fields import (
    batch_erode,
    anti_center_map,
    union_binary_mask,
    center_singularity_scores,
)
from unmore_tpu.ops.nms import nms_mask
from unmore_tpu.ops.connected_components import label_components, component_boxes
