"""minhash_dup_pairs slice of the ab_minhash_arrow variants."""
from tools.ab_minhash_arrow import VARIANTS_MH as VARIANTS  # noqa: F401
