from unmore_tpu.reasoning.proposals import seed_proposals, max_seed_count
from unmore_tpu.reasoning.engine import ReasoningConfig, ObjectDiscoveryEngine
