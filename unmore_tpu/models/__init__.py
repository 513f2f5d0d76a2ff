from unmore_tpu.models.vit import ViTBackbone, VIT_CONFIGS
from unmore_tpu.models.dpt import DPTFeatureExtractor
from unmore_tpu.models.objectness import ObjectnessNet
from unmore_tpu.models.resnet import ResNet50, BinaryClassifier
