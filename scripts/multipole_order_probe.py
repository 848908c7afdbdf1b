"""Measure how much theta opens per multipole order (mono/quad/octupole).

For random Plummer-distributed 256-particle clumps, compares the exact
acceleration at test points distance d = alpha * r_clump away against the
monopole / quadrupole / octupole approximations, in float64 and float32.
The alpha where each order's rms error crosses a target (1e-3, 3e-4) gives
the achievable theta (theta ~= 1/alpha for the group MAC) per order — the
decision data for implementing bh_multipole=3.

Pure numpy, CPU, seconds.
"""

import numpy as np

rng = np.random.default_rng(0)


def plummer_clump(n=256, a=1.0):
    m = rng.uniform(0.5, 1.5, n)
    # plummer radial profile
    x = rng.uniform(0, 1, n)
    r = a / np.sqrt(x ** (-2.0 / 3.0) - 1.0)
    r = np.minimum(r, 5 * a)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    return r[:, None] * u, m


def moments(p, m):
    M = m.sum()
    com = (m[:, None] * p).sum(0) / M
    d = p - com
    r = np.linalg.norm(d, axis=1).max()
    d2 = (d * d).sum(1)
    Q = np.zeros((3, 3))
    O = np.zeros((3, 3, 3))
    for i in range(3):
        for j in range(3):
            Q[i, j] = (m * (3 * d[:, i] * d[:, j] - (i == j) * d2)).sum()
    for i in range(3):
        for j in range(3):
            for k in range(3):
                t = 15 * d[:, i] * d[:, j] * d[:, k]
                t -= 3 * d2 * ((i == j) * d[:, k] + (i == k) * d[:, j]
                               + (j == k) * d[:, i])
                O[i, j, k] = (m * t).sum()
    return M, com, r, Q, O


def approx_acc(x, com, M, Q, O, order):
    """Acceleration at x from multipoles about com (G=1)."""
    dvec = com - x
    d2 = (dvec * dvec).sum()
    u = 1.0 / np.sqrt(d2)
    a = M * u ** 3 * dvec
    if order >= 2:
        qd = Q @ dvec
        qq = dvec @ qd
        a = a + 2.5 * qq * u ** 7 * dvec - u ** 5 * qd
    if order >= 3:
        # octupole: phi = -(1/6) O_ijk n_i n_j n_k ... use direct tensor form
        # a_l = d/dx_l [ (1/6) O_ijk x_i x_j x_k / r^7 *? ]  — use the
        # standard STF expansion: phi_oct = -(1/6) O_ijk d_i d_j d_k / d^7
        # (with O traceless); a = -grad phi.
        od = np.einsum("ijk,j,k->i", O, dvec, dvec)
        ooo = np.einsum("ijk,i,j,k->", O, dvec, dvec, dvec)
        a = a + 0.5 * u ** 7 * od - (7.0 / 6.0) * ooo * u ** 9 * dvec
    return a


def exact_acc(x, p, m, dtype=np.float64):
    d = p.astype(dtype) - x.astype(dtype)
    r2 = (d * d).sum(1)
    w = m.astype(dtype) * r2 ** -1.5
    return (w[:, None] * d).sum(0)


def main():
    alphas = np.array([1.0, 1.1, 1.25, 1.4, 1.6, 1.8, 2.0, 2.3, 2.6, 3.0])
    n_clumps, n_dirs = 40, 8
    errs = {1: [], 2: [], 3: []}
    for _ in range(n_clumps):
        p, m = plummer_clump()
        M, com, r, Q, O = moments(p, m)
        for ia, al in enumerate(alphas):
            for _ in range(n_dirs):
                u = rng.normal(size=3)
                u /= np.linalg.norm(u)
                x = com + al * r * u
                ex = exact_acc(x, p, m)
                nrm = np.linalg.norm(ex)
                for order in (1, 2, 3):
                    ap = approx_acc(x, com, M, Q, O, order)
                    errs[order].append((al, np.linalg.norm(ap - ex) / nrm))
    print(f"{'alpha':>6} | {'mono rms':>10} {'quad rms':>10} {'oct rms':>10}")
    for al in alphas:
        row = []
        for order in (1, 2, 3):
            e = np.array([e for a, e in errs[order] if a == al])
            row.append(np.sqrt((e ** 2).mean()))
        print(f"{al:6.2f} | {row[0]:10.2e} {row[1]:10.2e} {row[2]:10.2e}")
    # theta at which each order hits the error targets
    for target in (1e-3, 3e-4):
        out = []
        for order in (1, 2, 3):
            best = None
            for al in alphas:
                e = np.array([e for a, e in errs[order] if a == al])
                if np.sqrt((e ** 2).mean()) < target:
                    best = al
                    break
            out.append(f"order{order}: theta<={1/best:.2f}" if best else
                       f"order{order}: n/a")
        print(f"rms<{target:g}: " + "  ".join(out))


if __name__ == "__main__":
    main()
