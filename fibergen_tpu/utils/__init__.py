def cpu_only_platform(jax) -> bool:
    """True when JAX is pinned to the CPU backend (JAX_PLATFORMS / the
    jax_platforms config resolve to cpu alone).

    The persistent compilation cache is gated on this: XLA:CPU caches AOT
    machine code and re-loading it logs E-level "machine feature mismatch
    ... could lead to SIGILL" warnings whenever the recorded compile
    features differ from the host detection (the virtual
    prefer-no-scatter/gather tuning features always do).  TPU executables
    have no such host-ISA coupling, and the cache's measured win (cold
    Grosmont 218 s -> warm 44 s) is entirely the 20-60 s/program tunnel
    compiles — so cache on TPU, recompile on CPU.
    """
    try:
        cfg = jax.config.jax_platforms or ""
    except Exception:  # noqa: BLE001 - config layout drift
        cfg = ""
    names = [p.strip().lower() for p in cfg.split(",") if p.strip()]
    return bool(names) and all(n == "cpu" for n in names)
