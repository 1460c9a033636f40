# coding: utf-8
"""Numerical validation of the closed-form Morse propagation map.

Checks the exact action-angle solution for q(t), p(t), the monodromy
M(t) = dZ(t)/dZ(0) in the regularized J-hat factorization, and the
classical action S(t) = int (T - V) dt against a very-small-step RK4
reference (f64 numpy), over a range of energies including the harmonic
limit (eps -> 0) and fairly anharmonic orbits (eps ~ 0.8).

Run: python scripts/exact_morse_check.py
"""
import numpy as np


def morse_VgH(q, a, D):
    ex = np.exp(-a * q)
    V = D * (1.0 - ex) ** 2
    g = 2 * a * D * ex * (1.0 - ex)
    h = 2 * a * a * D * ex * (2 * ex - 1.0)
    return V, g, h


def rk4_reference(q0, p0, a, D, t, nsub=20000):
    """Integrate (q, p, Mqq, Mqp, Mpq, Mpp, S) with tiny-step RK4."""
    y = np.array([q0, p0, 1.0, 0.0, 0.0, 1.0, 0.0])
    dt = t / nsub

    def f(y):
        q, p, mqq, mqp, mpq, mpp, S = y
        V, g, h = morse_VgH(q, a, D)
        return np.array([p, -g, mpq, mpp, -h * mqq, -h * mqp,
                         0.5 * p * p - V])

    for _ in range(nsub):
        k1 = f(y)
        k2 = f(y + 0.5 * dt * k1)
        k3 = f(y + 0.5 * dt * k2)
        k4 = f(y + dt * k3)
        y = y + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return y


def exact_setup(q0, p0, a, D):
    """Per-trajectory constants of the closed-form map."""
    w0 = a * np.sqrt(2.0 * D)
    V0, g0, _ = morse_VgH(q0, a, D)
    E = 0.5 * p0 * p0 + V0
    eps = E / D
    assert 0.0 <= eps < 1.0, f"unbound orbit eps={eps}"
    s = np.sqrt(eps)
    wE = w0 * np.sqrt(1.0 - eps)
    # phase: e^{a q} = (1 - s cos th)/(1 - eps);  p ~ sin th
    eaq = np.exp(a * q0)
    cos_part = 1.0 - (1.0 - eps) * eaq          # = s cos th0
    sin_part = a * p0 * (1.0 - eps) * eaq / wE  # = s sin th0
    th0 = np.arctan2(sin_part, cos_part)
    return dict(w0=w0, E=E, eps=eps, s=s, wE=wE, th0=th0)


def jhat(th, c):
    """Regularized Jacobian J-hat(th) = d(q,p)/d(th,eps) . diag(1/s, s).

    J = Jhat . diag(s, 1/s); all entries finite as s -> 0."""
    a_ = c["a"]
    s, eps, wE = c["s"], c["eps"], c["wE"]
    wpE = -c["w0"] / (2.0 * np.sqrt(1.0 - eps)) if eps < 1 else np.nan
    sn, cs = np.sin(th), np.cos(th)
    den = 1.0 - s * cs
    r = 1.0 / den
    J11 = sn * r / a_                               # Q_th / s
    J21 = (wE / a_) * (cs - s) * r * r              # P_th / s
    J12 = (-cs * r / 2.0 + s / (1.0 - eps)) / a_    # s * Q_eps
    J22 = sn * ((wpE * eps + wE / 2.0) / a_ * r
                + (s * wE / (2.0 * a_)) * cs * r * r)  # s * P_eps
    return np.array([[J11, J12], [J21, J22]]), wpE


def exact_qp(th, c):
    a_, s, eps, wE = c["a"], c["s"], c["eps"], c["wE"]
    den = 1.0 - s * np.cos(th)
    q = (np.log(den) - np.log1p(-eps)) / a_
    p = (s * wE / a_) * np.sin(th) / den
    return q, p


def action_periodic(th, c):
    """P(th): the periodic part of -2 (D/wE) * I(th) (see derivation).

    I(th) = th - (1-eps) F1(th) + (1-eps) s sin th / den
    F1(th) = (th + g(th)) / sqrt(1-eps)
    g(th) = 2 atan(beta sin th / (1 - beta cos th)), beta = s/(1+sqrt(1-eps))
    The secular part th(1 - sqrt(1-eps)) is accounted separately."""
    s, eps, D, wE = c["s"], c["eps"], c["D"], c["wE"]
    rt = np.sqrt(1.0 - eps)
    beta = s / (1.0 + rt)
    sn, cs = np.sin(th), np.cos(th)
    den = 1.0 - s * cs
    g = 2.0 * np.arctan(beta * sn / (1.0 - beta * cs))
    per = -rt * g + (1.0 - eps) * s * sn / den
    return -2.0 * (D / wE) * per


def exact_state(t, c):
    """Full closed-form state at time t (setup at t=0, M(0)=I)."""
    th = c["th0"] + c["wE"] * t
    q, p = exact_qp(th, c)
    # monodromy: M = Jhat(th) . [[1, eps*wpE*t],[0,1]] . Jhat(th0)^-1
    Jt, wpE = jhat(th, c)
    J0, _ = jhat(c["th0"], c)
    det0 = J0[0, 0] * J0[1, 1] - J0[0, 1] * J0[1, 0]
    J0inv = np.array([[J0[1, 1], -J0[0, 1]],
                      [-J0[1, 0], J0[0, 0]]]) / det0
    shear = np.array([[1.0, c["eps"] * wpE * t], [0.0, 1.0]])
    M = Jt @ shear @ J0inv
    # action: S = E t - 2 (D/wE) [I(th) - I(th0)]
    rt = np.sqrt(1.0 - c["eps"])
    A = c["E"] - 2.0 * c["D"] * (1.0 - rt)   # secular dS/dt
    S = A * t + action_periodic(th, c) - action_periodic(c["th0"], c)
    # analytic det(J) = D / wE check (theta-independence of det)
    detJ_expect = c["D"] / c["wE"]
    return q, p, M, S, det0, detJ_expect


def main():
    rng = np.random.default_rng(7)
    worst = {k: 0.0 for k in ("q", "p", "M", "S", "detM", "detJ")}
    cases = []
    # sweep: (omega, chi) like the AS bench, energies from near-harmonic
    # to strongly anharmonic
    for trial in range(60):
        omega = rng.uniform(200.0, 3000.0) / 219474.63
        chi = rng.choice([1e-4, 0.002, 0.02, 0.08])
        a = np.sqrt(2.0 * omega * chi)
        D = 0.25 * omega / chi
        # pick a target eps, then initial conditions on that shell
        eps = rng.choice([1e-10, 1e-6, 1e-3, 0.05, 0.3, 0.8])
        E = eps * D
        frac = rng.uniform(0.0, 1.0)           # kinetic fraction
        p0 = np.sqrt(2.0 * E * frac) * rng.choice([-1.0, 1.0])
        # position from V(q0) = E (1 - frac), inner or outer side
        u = 1.0 + np.sqrt(eps * (1 - frac)) * rng.choice([-1.0, 1.0])
        q0 = -np.log(u) / a
        t = rng.uniform(0.5, 3.5) * 2 * np.pi / omega
        cases.append((omega, chi, a, D, q0, p0, t, eps))

    for (omega, chi, a, D, q0, p0, t, eps_t) in cases:
        c = exact_setup(q0, p0, a, D)
        c["a"], c["D"] = a, D
        q, p, M, S, det0, detJ_expect = exact_state(t, c)
        ref = rk4_reference(q0, p0, a, D, t)
        scale_q = max(abs(q0), 1.0 / np.sqrt(omega))
        scale_p = max(abs(p0), np.sqrt(omega))
        err = dict(
            q=abs(q - ref[0]) / scale_q,
            p=abs(p - ref[1]) / scale_p,
            M=np.max(np.abs(M.ravel()
                            - np.array([ref[2], ref[3], ref[4], ref[5]])))
            / max(1.0, np.max(np.abs(M))),
            S=abs(S - ref[6]) / max(abs(S), 1e-3),
            detM=abs(M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0] - 1.0),
            detJ=abs(det0 - detJ_expect) / detJ_expect,
        )
        for k in worst:
            worst[k] = max(worst[k], err[k])
        if max(err.values()) > 1e-6:
            print(f"LOOSE: eps={eps_t:.2g} chi={chi} omega={omega:.4g} "
                  f"t/T={t * omega / (2 * np.pi):.2f} errs=" +
                  " ".join(f"{k}={v:.2e}" for k, v in err.items()))

    print("worst relative errors over", len(cases), "random orbits:")
    for k, v in worst.items():
        print(f"  {k:5s} {v:.3e}")
    ok = all(v < 1e-6 for v in worst.values())
    print("OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
