from .semiring_ops import (
    segment_logsumexp,
    segment_matvec,
    ell_matvec,
    dense_log_matvec,
    masked_logsumexp,
    make_dense_operator,
)
