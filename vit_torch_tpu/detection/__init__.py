from vit_torch_tpu.detection.boxes import (
    box_iou, generalized_box_iou, cxcywh_to_xyxy, xyxy_to_cxcywh, nms_padded,
)
from vit_torch_tpu.detection.coco_eval import COCO, COCOeval, CocoEvaluator
from vit_torch_tpu.detection.panoptic_data import (
    CocoPanopticDataset, id2rgb, masks_to_boxes, rgb2id,
)
