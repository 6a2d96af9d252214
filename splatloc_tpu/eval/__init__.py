from splatloc_tpu.eval import metrics, selection
from splatloc_tpu.eval.metrics import psnr_masked, pose_errors
from splatloc_tpu.eval.selection import select_landmarks, saliency_scores
