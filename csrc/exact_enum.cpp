// Exact-enumeration Boltzmann oracles for small spin lattices.
//
// Native test backend: enumerates ALL configurations of a periodic
// lattice with Gray-code single-site increments (O(1)/O(q) energy
// updates), so equilibrium observables of the Monte Carlo engines can be
// validated against exact sums on lattices far beyond what a Python
// enumeration reaches (2^24 Ising states or 4^12 clock states in
// ~seconds).  The reference has no analogous oracle — its only
// correctness check was cross-variant curve comparison (SURVEY.md §4).
//
// Exposed via ctypes (see cuda_fortran_mc_simulation_spin_tpu/utils/
// native.py).  Energies use the same bond convention as the framework:
// E = -Σ_sites s·(s_right + s_down) with periodic wraparound.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// neighbor index tables for a periodic nx × ny lattice, row-major (y, x)
struct Nbrs {
    std::vector<int> right, left, up, down;
    Nbrs(int nx, int ny) {
        const int n = nx * ny;
        right.resize(n); left.resize(n); up.resize(n); down.resize(n);
        for (int y = 0; y < ny; ++y) {
            for (int x = 0; x < nx; ++x) {
                const int i = y * nx + x;
                right[i] = y * nx + (x + 1) % nx;
                left[i] = y * nx + (x - 1 + nx) % nx;
                down[i] = ((y + 1) % ny) * nx + x;
                up[i] = ((y - 1 + ny) % ny) * nx + x;
            }
        }
    }
};

// standard binary-reflected Gray code: bit flipped at step k is
// count-trailing-zeros(k)
inline int flip_bit(uint64_t k) { return __builtin_ctzll(k); }

}  // namespace

extern "C" {

// <e>/site and <|m|>/site of the 2D Ising model, exact.
// Requires nx*ny <= 30.
int ising2d_exact(int nx, int ny, double beta, double* out_e,
                  double* out_absm) {
    const int n = nx * ny;
    if (n > 30 || n < 2) return -1;
    Nbrs nb(nx, ny);
    std::vector<int8_t> s(n, -1);  // state 0: all spins -1
    // initial energy and magnetization
    int64_t e = 0;
    for (int i = 0; i < n; ++i) e -= s[i] * (s[nb.right[i]] + s[nb.down[i]]);
    int64_t m = -n;

    // log-sum-exp accumulation for numerical safety
    double zmax = -1e300;
    std::vector<double> es, ms;
    es.reserve(1u << 20);
    const uint64_t total = 1ull << n;
    double z = 0.0, ze = 0.0, zm = 0.0;
    // first pass: find minimum energy for shifting (min e = -2n)
    const double shift = -2.0 * n;
    auto accumulate = [&](int64_t ev, int64_t mv) {
        const double w = std::exp(-beta * (static_cast<double>(ev) - shift));
        z += w;
        ze += w * static_cast<double>(ev);
        zm += w * static_cast<double>(mv < 0 ? -mv : mv);
    };
    accumulate(e, m);
    for (uint64_t k = 1; k < total; ++k) {
        const int i = flip_bit(k);
        // flipping site i: ΔE = 2·s_i·Σnbr, Δm = -2·s_i
        const int nsum = s[nb.right[i]] + s[nb.left[i]] + s[nb.up[i]] +
                         s[nb.down[i]];
        e += 2 * s[i] * nsum;
        m -= 2 * s[i];
        s[i] = static_cast<int8_t>(-s[i]);
        accumulate(e, m);
    }
    (void)zmax;
    *out_e = ze / z / n;
    *out_absm = zm / z / n;
    return 0;
}

// <e>/site and <m_x>/site of the q-state clock model, exact.
// Enumerates q^(nx*ny) states with mixed-radix Gray increments.
// Requires q^(nx*ny) <= ~2^34 (caller's responsibility to keep sane).
int clock_exact(int nx, int ny, int q, double beta, double* out_e,
                double* out_mx) {
    const int n = nx * ny;
    if (n < 2 || q < 2 || q > 64) return -1;
    // guard against absurd workloads: q^n <= 2^34
    double total_log = n * std::log2(static_cast<double>(q));
    if (total_log > 34.0) return -2;
    Nbrs nb(nx, ny);

    std::vector<double> c(q), sn(q);
    for (int k = 0; k < q; ++k) {
        c[k] = std::cos(2.0 * M_PI * k / q);
        sn[k] = std::sin(2.0 * M_PI * k / q);
    }
    // pairwise bond energy table
    std::vector<double> bond(q * q);
    for (int a = 0; a < q; ++a)
        for (int b = 0; b < q; ++b)
            bond[a * q + b] = -(c[a] * c[b] + sn[a] * sn[b]);

    std::vector<int> st(n, 0);
    double e = 0.0;
    for (int i = 0; i < n; ++i)
        e += bond[st[i] * q + st[nb.right[i]]] +
             bond[st[i] * q + st[nb.down[i]]];
    double mx = n;  // all state 0 => cos=1 each

    const double shift = -2.0 * n;
    double z = 0.0, ze = 0.0, zmx = 0.0;
    auto accumulate = [&]() {
        const double w = std::exp(-beta * (e - shift));
        z += w;
        ze += w * e;
        zmx += w * mx;
    };
    accumulate();

    // mixed-radix odometer with incremental updates (visits every state
    // exactly once; not Gray-minimal but each carry step is O(q) work)
    const uint64_t total = [&] {
        uint64_t t = 1;
        for (int i = 0; i < n; ++i) t *= static_cast<uint64_t>(q);
        return t;
    }();
    auto set_site = [&](int i, int v) {
        const int old = st[i];
        const int r = st[nb.right[i]], l = st[nb.left[i]],
                  u = st[nb.up[i]], d = st[nb.down[i]];
        e -= bond[old * q + r] + bond[old * q + l] + bond[old * q + u] +
             bond[old * q + d];
        e += bond[v * q + r] + bond[v * q + l] + bond[v * q + u] +
             bond[v * q + d];
        mx += c[v] - c[old];
        st[i] = v;
    };
    for (uint64_t k = 1; k < total; ++k) {
        int i = 0;
        while (st[i] == q - 1) {
            set_site(i, 0);
            ++i;
        }
        set_site(i, st[i] + 1);
        accumulate();
    }
    *out_e = ze / z / n;
    *out_mx = zmx / z / n;
    return 0;
}

}  // extern "C"
