"""Nistér 5-point minimal essential-matrix solver, batched and branch-free.

The reference's `find_essential_mat` call is OpenCV's 5-point RANSAC
(/root/reference/src/odometry/pose.rs:64-73). This module provides the
TPU-native minimal solver: given 5 normalized correspondences it returns up
to N_ROOT_SLOTS (18) essential-matrix candidates, entirely with fixed shapes so thousands of
RANSAC hypotheses solve as one batch.

Pipeline (Nistér, "An efficient solution to the five-point relative pose
problem", PAMI 2004 — re-derived here from the published math, not from any
implementation):

  1. 4-dimensional null space of the 5x9 epipolar design matrix via one
     batched complete QR of A^T (exact: rank(A) <= 5, kernel = last 4
     columns of Q): E(x,y,z) = x E1 + y E2 + z E3 + E4.
  2. The ten cubic constraints — det(E) = 0 and (E E^T - 1/2 tr(E E^T) I) E
     = 0 — expanded over the 20 monomials of degree <= 3 in (x, y, z) by
     trace-time polynomial arithmetic (every coefficient is a batched array).
  3. Gauss-Jordan elimination of the 10x20 system by one batched 10x10
     solve, then Nistér's row combinations <k> = <e> - z<f>, <l> = <g> - z<h>,
     <m> = <i> - z<j> give a 3x3 matrix B(z) acting on (x, y, 1); the
     degree-10 polynomial n(z) = det B(z) is assembled by 1-D coefficient
     convolutions.
  4. Real roots of n: sign changes on a tan-spaced grid (so the whole real
     line is covered with good resolution near 0) + fixed-iteration bisection
     — an eigen/companion route needs a nonsymmetric eigensolver, which XLA
     does not provide on TPU; bracketed bisection is branch-free and exact
     enough at 48 halvings.
  5. For each root, (x, y) from the null vector of B(z) (largest cross
     product of two rows), and E = x E1 + y E2 + z E3 + E4.

Everything is `vmap`-free at the API level: inputs may carry arbitrary batch
dimensions and all the algebra broadcasts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .epipolar import _f32_precision, _homogeneous

__all__ = ["five_point_candidates"]


# --------------------------------------------------------------------------
# Trace-time multivariate polynomial arithmetic over (x, y, z).
#
# A polynomial of degree d is a trailing-axis coefficient vector over the
# monomial basis below; each coefficient is a batched jnp array.
# --------------------------------------------------------------------------

_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]  # x, y, z, 1

_DEG2 = [
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (1, 0, 0), (0, 2, 0),
    (0, 1, 1), (0, 1, 0), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]

# Nistér's column order: the first 10 monomials (degree >= 2 in x, y) are the
# ones eliminated by Gauss-Jordan; the last 10 factor as
# x*(z^2, z, 1), y*(z^2, z, 1), (z^3, z^2, z, 1).
_DEG3 = [
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    # --- tail ---
    (1, 0, 2), (1, 0, 1), (1, 0, 0),
    (0, 1, 2), (0, 1, 1), (0, 1, 0),
    (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]

_DEG2_IDX = {e: i for i, e in enumerate(_DEG2)}
_DEG3_IDX = {e: i for i, e in enumerate(_DEG3)}


def _poly_mul(a, b, exps_a, exps_b, out_idx, out_len):
    """Multiply coefficient vectors a [..., len_a] * b [..., len_b]."""
    terms = [[] for _ in range(out_len)]
    for ia, ea in enumerate(exps_a):
        for ib, eb in enumerate(exps_b):
            key = (ea[0] + eb[0], ea[1] + eb[1], ea[2] + eb[2])
            terms[out_idx[key]].append(a[..., ia] * b[..., ib])
    cols = []
    for t in terms:
        acc = t[0]
        for extra in t[1:]:
            acc = acc + extra
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def _mul11(a, b):  # deg1 * deg1 -> deg2
    return _poly_mul(a, b, _DEG1, _DEG1, _DEG2_IDX, 10)


def _mul21(a, b):  # deg2 * deg1 -> deg3
    return _poly_mul(a, b, _DEG2, _DEG1, _DEG3_IDX, 20)


def _constraint_matrix(basis):
    """The 10x20 cubic-constraint coefficient matrix.

    basis: [..., 4, 3, 3] null-space essential matrices (x, y, z, 1 slots).
    Returns [..., 10, 20] over the `_DEG3` monomial order.
    """
    # E[i][j] is a degree-1 coefficient vector [..., 4].
    e = [[basis[..., :, i, j] for j in range(3)] for i in range(3)]

    rows = []

    # det(E) = 0: six signed triple products.
    det = None
    for (a, b, c), sign in (
        ((0, 1, 2), 1.0), ((1, 2, 0), 1.0), ((2, 0, 1), 1.0),
        ((0, 2, 1), -1.0), ((1, 0, 2), -1.0), ((2, 1, 0), -1.0),
    ):
        term = _mul21(_mul11(e[0][a], e[1][b]), e[2][c])
        det = term * sign if det is None else det + term * sign
    rows.append(det)

    # (E E^T - 1/2 tr(E E^T) I) E = 0: nine cubics.
    t = [[None] * 3 for _ in range(3)]  # E E^T, degree 2
    for i in range(3):
        for j in range(3):
            acc = _mul11(e[i][0], e[j][0])
            acc = acc + _mul11(e[i][1], e[j][1])
            acc = acc + _mul11(e[i][2], e[j][2])
            t[i][j] = acc
    half_tr = 0.5 * (t[0][0] + t[1][1] + t[2][2])
    for i in range(3):
        t[i][i] = t[i][i] - half_tr
    for i in range(3):
        for j in range(3):
            acc = _mul21(t[i][0], e[0][j])
            acc = acc + _mul21(t[i][1], e[1][j])
            acc = acc + _mul21(t[i][2], e[2][j])
            rows.append(acc)

    return jnp.stack(rows, axis=-2)  # [..., 10, 20]


# --------------------------------------------------------------------------
# 1-D polynomial helpers (ascending powers, fixed lengths).
# --------------------------------------------------------------------------


def _conv1d(a, b):
    """Coefficient convolution: a [..., la] * b [..., lb] -> [..., la+lb-1]."""
    la, lb = a.shape[-1], b.shape[-1]
    terms = [[] for _ in range(la + lb - 1)]
    for i in range(la):
        for j in range(lb):
            terms[i + j].append(a[..., i] * b[..., j])
    cols = []
    for t in terms:
        acc = t[0]
        for extra in t[1:]:
            acc = acc + extra
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def _polyval(coeffs, x):
    """Horner evaluation; coeffs [..., L] ascending, x [...] broadcastable."""
    acc = coeffs[..., -1]
    for i in range(coeffs.shape[-1] - 2, -1, -1):
        acc = acc * x + coeffs[..., i]
    return acc


def _sign_eval(coeffs, coeffs_rev, z):
    """Sign-faithful evaluation of an even-degree polynomial on all of R.

    For |z| <= 1 evaluate n(z) directly; for |z| > 1 evaluate the reversed
    polynomial at 1/z, which equals n(z) / z^deg — same sign for even degree
    and numerically bounded, so tan-grid endpoints (|z| -> inf) stay finite.
    """
    inner = jnp.abs(z) <= 1.0
    z_in = jnp.where(inner, z, 1.0)
    z_out = jnp.where(inner, 1.0, z)
    return jnp.where(
        inner, _polyval(coeffs, z_in), _polyval(coeffs_rev, 1.0 / z_out)
    )


# 10 sign-change brackets + 4 Newton seeds for near-double pairs + 4 quadratic
# "siblings" (the second root of each near-double pair).
N_ROOT_SLOTS = 18


def _real_roots_deg10(
    coeffs,
    n_grid: int = 512,
    bisect_iters: int = 30,
    newton_iters: int = 16,
    n_newton_seeds: int = 4,
):
    """Real roots of a batched degree-10 polynomial.

    coeffs: [..., 11] ascending powers. Returns (roots [..., N_ROOT_SLOTS],
    valid [..., N_ROOT_SLOTS]).

    Two mechanisms (an eigen/companion route needs a nonsymmetric
    eigensolver, which XLA lacks on TPU; this stays branch-free):
      * Sign changes between consecutive points of a tan-spaced grid covering
        the whole real line, refined by fixed-iteration bisection (up to 10);
        30 halvings of a ~0.006-wide theta bracket reach ~5e-12, below f32
        resolution for tan-space roots of typical magnitude.
      * Near-double root PAIRS inside one grid cell produce no sign change —
        only a dip of |n| toward zero. The deepest local minima of |n| seed
        Newton iterations (up to `n_newton_seeds`), validated by the residual
        after convergence; each converged Newton root additionally emits its
        pair sibling from the local quadratic model r1 = r0 - 2 n'/n'' (then
        polished), since Newton finds only one root of a close pair. A seed
        that converges onto an already-bracketed root is harmless: duplicate
        candidates just score identically.
    """
    dtype = coeffs.dtype
    scale = jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True)
    c = coeffs / jnp.where(scale > 0, scale, 1.0)
    c_rev = c[..., ::-1]

    eps = 1e-3
    thetas = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, n_grid, dtype=dtype)
    grid_z = jnp.tan(thetas)
    vals = _sign_eval(c[..., None, :], c_rev[..., None, :], grid_z)  # [..., G]

    sign = jnp.sign(vals)
    change = (sign[..., :-1] * sign[..., 1:]) < 0  # NaNs compare False
    # Select up to 10 bracketing cells; rank = changed-first, then position.
    score = change.astype(jnp.float32) * 2.0 - jnp.arange(
        n_grid - 1, dtype=jnp.float32
    ) / (n_grid - 1)
    _, cells = jax.lax.top_k(score, 10)  # [..., 10]
    valid = jnp.take_along_axis(change, cells, axis=-1)

    lo = thetas[cells]
    hi = thetas[cells + 1]
    f_lo = jnp.take_along_axis(vals, cells, axis=-1)

    def body(state, _):
        lo, hi, f_lo = state
        mid = 0.5 * (lo + hi)
        f_mid = _sign_eval(c[..., None, :], c_rev[..., None, :], jnp.tan(mid))
        go_right = jnp.sign(f_mid) == jnp.sign(f_lo)
        lo_new = jnp.where(go_right, mid, lo)
        hi_new = jnp.where(go_right, hi, mid)
        f_lo_new = jnp.where(go_right, f_mid, f_lo)
        return (lo_new, hi_new, f_lo_new), None

    (lo, hi, _), _ = jax.lax.scan(body, (lo, hi, f_lo), None, length=bisect_iters)
    roots = jnp.tan(0.5 * (lo + hi))

    # ---- Newton seeds at local minima of |n| ----------------------------
    av = jnp.abs(vals)
    is_min = (av[..., 1:-1] <= av[..., :-2]) & (av[..., 1:-1] <= av[..., 2:])
    # Prefer deep minima; exclude cells already adjacent to a sign change.
    no_change = ~(change[..., :-1] | change[..., 1:])
    min_score = jnp.where(
        is_min & no_change, -jnp.log1p(av[..., 1:-1].astype(jnp.float32)), -jnp.inf
    )
    _, seed_idx = jax.lax.top_k(min_score, n_newton_seeds)
    seed_ok = jnp.take_along_axis(
        jnp.isfinite(min_score) & (min_score > -jnp.inf), seed_idx, axis=-1
    )
    z = grid_z[seed_idx + 1]

    # Derivative coefficients (ascending).
    dcoef = c[..., 1:] * jnp.arange(1, 11, dtype=dtype)

    def newton(z, _):
        f = _polyval(c[..., None, :], z)
        df = _polyval(dcoef[..., None, :], z)
        step = f / jnp.where(jnp.abs(df) > 1e-30, df, 1e-30)
        step = jnp.clip(step, -1.0, 1.0)  # keep near the seed cell
        return z - step, None

    z = jnp.clip(z, -1e3, 1e3)
    z, _ = jax.lax.scan(newton, z, None, length=newton_iters)
    resid = jnp.abs(_polyval(c[..., None, :], z))
    newton_valid = seed_ok & jnp.isfinite(z) & (resid < 1e-4)

    # Pair siblings: near r0 the polynomial is ~ a (z - r0)(z - r1), so
    # r1 = r0 - 2 n'(r0) / n''(r0); polish with the same Newton step.
    d2coef = dcoef[..., 1:] * jnp.arange(1, 10, dtype=dtype)
    d1 = _polyval(dcoef[..., None, :], z)
    d2 = _polyval(d2coef[..., None, :], z)
    d2_safe = jnp.where(jnp.abs(d2) > 1e-30, d2, 1e-30)
    sib = jnp.clip(z - 2.0 * d1 / d2_safe, -1e3, 1e3)
    sib, _ = jax.lax.scan(newton, sib, None, length=newton_iters)
    sib_resid = jnp.abs(_polyval(c[..., None, :], sib))
    sib_valid = seed_ok & jnp.isfinite(sib) & (sib_resid < 1e-4)

    roots = jnp.concatenate([roots, z, sib], axis=-1)
    valid = jnp.concatenate([valid, newton_valid, sib_valid], axis=-1)
    return roots, valid


# --------------------------------------------------------------------------
# The solver.
# --------------------------------------------------------------------------


def _nullspace4(pts1, pts2, method: str = "qr"):
    """Orthonormal 4-basis of the epipolar design-matrix null space.

    pts: [..., 5, 2] normalized. Returns [..., 4, 3, 3] (row-major E's,
    matching `eight_point`'s flattening: A[..., n, 3j+k] = x2[j] * x1[k]).

    method="qr" (default): the 5x9 design matrix has rank <= 5, so its
    kernel is the orthogonal complement of the column space of A^T — the
    last 4 columns of A^T's COMPLETE QR factor. One batched 9x5 Householder
    QR replaces the 9x9 `eigh` (a QR-iteration eigensolver on TPU that
    dominated the 5-point RANSAC profile), is exact (no iteration, no shift
    tuning), and the Nistér parameterization E = x E1 + y E2 + z E3 + E4
    accepts ANY orthonormal kernel basis.
    method="eigh": reference path (tests pin qr against it).
    """
    x1 = _homogeneous(pts1)
    x2 = _homogeneous(pts2)
    a = x2[..., :, :, None] * x1[..., :, None, :]
    a = a.reshape(*a.shape[:-2], 9)  # [..., 5, 9]
    if method == "eigh":
        ata = jnp.einsum("...ni,...nj->...ij", a, a)
        _, vecs = jnp.linalg.eigh(ata)  # ascending eigenvalues
        basis = jnp.swapaxes(vecs[..., :, :4], -1, -2)  # [..., 4, 9]
        return basis.reshape(*basis.shape[:-1], 3, 3)

    q, _ = jnp.linalg.qr(jnp.swapaxes(a, -1, -2), mode="complete")  # [..., 9, 9]
    basis = jnp.swapaxes(q[..., :, 5:], -1, -2)  # [..., 4, 9]
    return basis.reshape(*basis.shape[:-1], 3, 3)


def _solve_pivoted(a, b):
    """Batched solve of a x = b via branch-free Gauss-Jordan with partial
    pivoting. a [..., n, n], b [..., n, m].

    XLA's `linalg.solve` lowers to an LU whose row-by-row dynamic-slice loop
    dominated the whole five-point RANSAC on TPU (measured 0.79 of the
    1.25 ms/frame pipeline at 128 hypotheses — tools/profile_5pt_stages.py).
    This version runs n fully-batched elementwise elimination steps (one
    masked argmax + two rank-1 updates each) and recovers the row order at
    the end with a single permutation matmul: after full Gauss-Jordan the
    leading n columns hold exactly the permutation matrix P (row p_k = e_k),
    so x = P^T * reduced_rhs. Singular systems yield inf/NaN rows, which
    downstream validity masks absorb — identical to the LU path's behavior.
    """
    n = a.shape[-1]
    aug = jnp.concatenate([a, b], axis=-1)  # [..., n, n+m]
    used = jnp.zeros(a.shape[:-1], bool)  # [..., n]

    for k in range(n):
        col = aug[..., :, k]
        score = jnp.where(used, -jnp.inf, jnp.abs(col))
        p = jnp.argmax(score, axis=-1)  # [...]
        onehot = jax.nn.one_hot(p, n, dtype=aug.dtype)  # [..., n]
        pivot_row = jnp.einsum("...r,...rc->...c", onehot, aug)  # [..., n+m]
        norm_row = pivot_row / pivot_row[..., k : k + 1]
        # Eliminate column k from every row (incl. the pivot row), then put
        # the normalized pivot row back.
        aug = aug - col[..., :, None] * norm_row[..., None, :]
        aug = aug + onehot[..., :, None] * norm_row[..., None, :]
        used = used | (onehot > 0.5)

    # Leading n columns now hold P (row p_k = e_k): x = P^T * rhs.
    return jnp.einsum("...rk,...rc->...kc", aug[..., :, :n], aug[..., :, n:])


def _z_shift(p):
    """Multiply an ascending-coefficient z-polynomial by z."""
    return jnp.concatenate([jnp.zeros_like(p[..., :1]), p], axis=-1)


def _row_tail(r, row):
    """Split reduced row `row`'s tail into (x-poly [3], y-poly [3], 1-poly [4]),
    ascending powers of z (tail columns: x*(z^2,z,1), y*(z^2,z,1), z^3..1)."""
    px = jnp.stack([r[..., row, 2], r[..., row, 1], r[..., row, 0]], axis=-1)
    py = jnp.stack([r[..., row, 5], r[..., row, 4], r[..., row, 3]], axis=-1)
    p1 = jnp.stack(
        [r[..., row, 9], r[..., row, 8], r[..., row, 7], r[..., row, 6]], axis=-1
    )
    return px, py, p1


@_f32_precision
def five_point_candidates(pts1, pts2):
    """Essential-matrix candidates from exactly 5 correspondences.

    pts1, pts2: [..., 5, 2] K-normalized points (p2 = R p1 + t convention,
    x2^T E x1 = 0 — same as `eight_point`).

    Returns (essentials [..., N_ROOT_SLOTS, 3, 3] unit-Frobenius,
    valid [..., N_ROOT_SLOTS]). Invalid slots (fewer real roots than slots,
    or a degenerate sample whose elimination failed) have valid=False and
    unspecified matrices; score and mask them out.
    """
    basis = _nullspace4(pts1, pts2)  # [..., 4, 3, 3] for slots (x, y, z, 1)
    m = _constraint_matrix(basis)  # [..., 10, 20]

    a_lead = m[..., :, :10]
    b_tail = m[..., :, 10:]
    # Gauss-Jordan in one batched solve: rows of r give the reduced tails in
    # leading-monomial order x^3, y^3, x^2 y, x y^2, x^2 z, x^2, y^2 z, y^2,
    # x y z, x y. Degenerate samples make a_lead singular; the NaN/inf rows
    # propagate to invalid roots below. (_solve_pivoted, not linalg.solve:
    # XLA's LU loop was 64% of the whole 5pt frame budget on TPU.)
    r = _solve_pivoted(a_lead, b_tail)  # [..., 10, 10]

    def combo(row_top, row_bot):
        """<top> - z<bot>: rows with leading monomials (M z, M)."""
        tx, ty, t1 = _row_tail(r, row_top)
        bx, by, b1 = _row_tail(r, row_bot)
        kx = jnp.concatenate([tx, jnp.zeros_like(tx[..., :1])], -1) - _z_shift(bx)
        ky = jnp.concatenate([ty, jnp.zeros_like(ty[..., :1])], -1) - _z_shift(by)
        k1 = jnp.concatenate([t1, jnp.zeros_like(t1[..., :1])], -1) - _z_shift(b1)
        return kx, ky, k1  # degrees (3, 3, 4): lengths (4, 4, 5)

    kx, ky, k1 = combo(4, 5)  # x^2 z, x^2
    lx, ly, l1 = combo(6, 7)  # y^2 z, y^2
    mx, my, m1 = combo(8, 9)  # x y z, x y

    # n(z) = det [[kx, ky, k1], [lx, ly, l1], [mx, my, m1]] — degree 10.
    n = (
        _conv1d(kx, _conv1d(ly, m1) - _conv1d(l1, my))
        - _conv1d(ky, _conv1d(lx, m1) - _conv1d(l1, mx))
        + _conv1d(k1, _conv1d(lx, my) - _conv1d(ly, mx))
    )  # [..., 11]

    roots, valid = _real_roots_deg10(n)  # [..., N_ROOT_SLOTS]

    # (x, y) for each root: null vector of B(z) = cross product of the two
    # most independent rows.
    z = roots
    rk = jnp.stack(
        [_polyval(kx[..., None, :], z), _polyval(ky[..., None, :], z), _polyval(k1[..., None, :], z)],
        axis=-1,
    )  # [..., N_ROOT_SLOTS, 3]
    rl = jnp.stack(
        [_polyval(lx[..., None, :], z), _polyval(ly[..., None, :], z), _polyval(l1[..., None, :], z)],
        axis=-1,
    )
    rm = jnp.stack(
        [_polyval(mx[..., None, :], z), _polyval(my[..., None, :], z), _polyval(m1[..., None, :], z)],
        axis=-1,
    )
    crosses = jnp.stack(
        [jnp.cross(rk, rl), jnp.cross(rk, rm), jnp.cross(rl, rm)], axis=-2
    )  # [..., N_ROOT_SLOTS, 3, 3]
    norms = jnp.linalg.norm(crosses, axis=-1)
    pick = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(crosses, pick[..., None, None], axis=-2)[..., 0, :]
    w = v[..., 2]
    w_safe = jnp.where(jnp.abs(w) > 1e-18, w, 1e-18)
    x = v[..., 0] / w_safe
    y = v[..., 1] / w_safe
    valid = valid & jnp.isfinite(x) & jnp.isfinite(y) & (jnp.abs(w) > 1e-18)

    # E = x E1 + y E2 + z E3 + E4.
    coeff = jnp.stack([x, y, z, jnp.ones_like(z)], axis=-1)  # [..., N_ROOT_SLOTS, 4]
    es = jnp.einsum("...rc,...cij->...rij", coeff, basis)
    fro = jnp.linalg.norm(es, axis=(-2, -1), keepdims=True)
    es = es / jnp.maximum(fro, 1e-18)
    return es, valid
