from .proposals import (
    MIN_PROP_S,
    PROPOSAL_FUNCS,
    propose_batch,
    randn_orthobasis,
    sample_normal_in_range,
    statistics,
)
