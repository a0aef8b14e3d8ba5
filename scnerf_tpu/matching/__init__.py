from scnerf_tpu.matching.pairs import image_pair_candidates, flatten_pairs
from scnerf_tpu.matching.provider import (
    PairMatches, PrecomputedMatches, SIFTMatcher, SuperGlueMatcher,
    build_match_cache, pad_matches, sift_available,
)
from scnerf_tpu.matching.superglue_hf import (
    HFSuperGlueMatcher, hf_superglue_available,
)
