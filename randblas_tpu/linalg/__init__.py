"""Sketching-based linear algebra building blocks (the reference's
examples/ tier, as a library)."""

from .leverage import exact_leverage_scores, leverage_scores
from .distributed import (cholqr, distributed_fd,
                          distributed_krylov_rangefinder,
                          distributed_qb, distributed_rangefinder,
                          distributed_rsvd)
from .amm import amm, sample_lsq
from .eigh import rand_eigh, rand_geigh
from .embed import make_embedding
from .features import random_fourier_features
from .lstsq import (cgls, ihs_lsq, min_norm_lsq, ridge_lsq,
                    sketch_and_precondition, sketch_and_solve_lsq)
from .density import eig_count, kpm_density, spectral_density
from .kaczmarz import block_gauss_seidel, block_kaczmarz
from .krylov import krylov_rangefinder, rsvd_krylov
from .nystrom import nystrom, nystrom_apply, nystrom_pcg
from .qb import (adaptive_rangefinder, qb_decompose, qb_to_svd,
                 range_error_estimate, rangefinder)
from .quadrature import lanczos_fn_apply, logdet, slq
from .qrcp import column_id, cur, sketch_qrcp
from .rgs import rgs_qr
from .rpcholesky import rpcholesky, rpcholesky_pcg
from .sgmres import sgmres
from .rsvd import rsvd, rsvd_adaptive
from .spectral import (extremal_eigs, power_method, required_power_iters,
                       sketched_eigs, spectral_norm)
from .streaming import FrequentDirections, StreamingSketch, \
    fd_pass, single_pass_svd
from .tls import sketched_tls, tls_via_svd
from .tucker import tucker_from_dense, tucker_full
from .tt import (TTMatrix, TTStream, TTTensor, tt_add, tt_dot,
                 tt_from_dense, tt_gaussian, tt_matrix_gaussian,
                 tt_matvec, tt_norm, tt_round, tt_round_deterministic,
                 tt_scale, tt_single_pass)
from .trace import (diag_hutchinson, exact_trace, hutchinson, hutchpp,
                    rademacher_probes, xdiag, xtrace)

__all__ = ["amm",
           "adaptive_rangefinder",
           "cgls", "cholqr", "column_id", "cur",
           "distributed_fd", "distributed_krylov_rangefinder",
           "distributed_qb",
           "distributed_rangefinder", "distributed_rsvd", "fd_pass",
           "exact_leverage_scores",
           "exact_trace", "hutchinson", "krylov_rangefinder",
           "ihs_lsq", "make_embedding", "min_norm_lsq",
           "random_fourier_features",
           "range_error_estimate", "rsvd_krylov", "sketch_qrcp",
           "hutchpp", "lanczos_fn_apply", "leverage_scores", "logdet",
           "nystrom",
           "nystrom_apply", "nystrom_pcg", "slq",
           "qb_decompose", "qb_to_svd", "rademacher_probes", "rand_eigh", "rand_geigh",
           "rangefinder", "ridge_lsq", "rpcholesky", "rpcholesky_pcg",
           "TTMatrix", "TTStream", "TTTensor", "tt_add", "tt_dot",
           "tt_from_dense", "tt_single_pass",
           "tt_gaussian", "tt_matrix_gaussian", "tt_matvec",
           "tt_norm", "tt_round", "tt_round_deterministic", "tt_scale",
           "tucker_from_dense", "tucker_full",
           "rsvd", "rsvd_adaptive", "sample_lsq",
           "sgmres", "sketch_and_precondition",
           "sketch_and_solve_lsq", "sketched_tls", "tls_via_svd",
           "extremal_eigs", "power_method", "required_power_iters",
           "sketched_eigs", "spectral_norm", "StreamingSketch",
           "single_pass_svd",
           "diag_hutchinson", "xdiag", "xtrace",
           "block_gauss_seidel", "block_kaczmarz",
           "FrequentDirections",
           "eig_count", "kpm_density", "spectral_density",
           "rgs_qr"]
