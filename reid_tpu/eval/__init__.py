from .cmc_map import evaluate_all, evaluate_rerank
