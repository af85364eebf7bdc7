from .postprocess import FinalDetections, PostprocessConfig, postprocess_image
from .voc_eval import OpensetVocEvaluator, voc_ap
from .coco_eval import OpensetCocoEvaluator
from .os_cocoeval import OpenSetCocoEval
from .testing import CompiledInference, inference_on_dataset
from .proposals import evaluate_box_proposals
