/* Native binned-SAH BVH builder.
 *
 * The host-side build is the one part of the pipeline that is inherently
 * serial-recursive and latency-bound, so — like the reference, whose
 * builders are native C++ (tiny_bvh.h:2261-2461) — it is implemented in C
 * and called through ctypes. Same algorithm and SAH rules as
 * builders/binned.py (8-bin centroid binning on 3 axes, cost
 * c_trav + c_int·rSAV·(A_L·N_L + A_R·N_R) vs c_int·count, child AABBs from
 * binned fragment bounds), producing the canonical BVH2 layout:
 * root at node 0, slot 1 reserved, children in adjacent pairs.
 *
 * Build: cc -O3 -march=native -shared -fPIC builder.c -o libtinybvh.so
 */
#include <float.h>
#include <stdint.h>
#include <string.h>

#define BINS 8
#define C_TRAV 1.0f
#define C_INT 1.0f

typedef struct { float x, y, z; } vec3;

static inline float fmin3(float a, float b) { return a < b ? a : b; }
static inline float fmax3(float a, float b) { return a > b ? a : b; }

static inline float half_area(const float *mn, const float *mx) {
    float ex = mx[0] - mn[0], ey = mx[1] - mn[1], ez = mx[2] - mn[2];
    if (ex < 0) ex = 0; if (ey < 0) ey = 0; if (ez < 0) ez = 0;
    return ex * ey + ey * ez + ez * ex;
}

typedef struct {
    const float *fmin;   /* (N,3) fragment bounds */
    const float *fmax;
    const float *cent;   /* (N,3) centroids */
    float *node_min;     /* (M,3) out */
    float *node_max;
    int32_t *left_first;
    int32_t *count;
    int32_t *prim;       /* work permutation, length N */
    int32_t n_used;
    int32_t max_leaf;
} ctx_t;

typedef struct { int32_t node, start, cnt; } task_t;

/* Build the subtree rooted at `node` over prim[start:start+cnt].
 * Iterative with an explicit task stack (≙ the reference's task array). */
static void build_range(ctx_t *c, int32_t root, int32_t start0, int32_t cnt0) {
    task_t stack[128];
    int sp = 0;
    stack[sp++] = (task_t){root, start0, cnt0};

    while (sp > 0) {
        task_t t = stack[--sp];
        int32_t node = t.node, start = t.start, cnt = t.cnt;
        float *nmn = c->node_min + 3 * node;
        float *nmx = c->node_max + 3 * node;

        /* centroid bounds */
        float cbmin[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
        float cbmax[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        for (int32_t i = start; i < start + cnt; i++) {
            const float *ce = c->cent + 3 * c->prim[i];
            for (int a = 0; a < 3; a++) {
                cbmin[a] = fmin3(cbmin[a], ce[a]);
                cbmax[a] = fmax3(cbmax[a], ce[a]);
            }
        }

        int best_axis = -1, best_bin = -1;
        float best_cost = FLT_MAX;
        float bin_min[3][BINS][3], bin_max[3][BINS][3];
        int32_t bin_cnt[3][BINS];
        float scale[3];

        if (cnt > 1) {
            for (int a = 0; a < 3; a++) {
                float ext = cbmax[a] - cbmin[a];
                scale[a] = ext > 1e-20f ? BINS * 0.999999f / ext : 0.0f;
                for (int b = 0; b < BINS; b++) {
                    bin_cnt[a][b] = 0;
                    for (int k = 0; k < 3; k++) {
                        bin_min[a][b][k] = FLT_MAX;
                        bin_max[a][b][k] = -FLT_MAX;
                    }
                }
            }
            for (int32_t i = start; i < start + cnt; i++) {
                int32_t p = c->prim[i];
                const float *ce = c->cent + 3 * p;
                const float *fm = c->fmin + 3 * p;
                const float *fx = c->fmax + 3 * p;
                for (int a = 0; a < 3; a++) {
                    int b = (int)((ce[a] - cbmin[a]) * scale[a]);
                    if (b < 0) b = 0;
                    if (b >= BINS) b = BINS - 1;
                    bin_cnt[a][b]++;
                    for (int k = 0; k < 3; k++) {
                        bin_min[a][b][k] = fmin3(bin_min[a][b][k], fm[k]);
                        bin_max[a][b][k] = fmax3(bin_max[a][b][k], fx[k]);
                    }
                }
            }
            /* SAH sweep per axis */
            for (int a = 0; a < 3; a++) {
                if (scale[a] == 0.0f) continue;
                float lmin[BINS][3], lmax[BINS][3], rmin[BINS][3], rmax[BINS][3];
                int32_t lcnt[BINS], rcnt[BINS];
                for (int k = 0; k < 3; k++) {
                    lmin[0][k] = bin_min[a][0][k];
                    lmax[0][k] = bin_max[a][0][k];
                    rmin[BINS - 1][k] = bin_min[a][BINS - 1][k];
                    rmax[BINS - 1][k] = bin_max[a][BINS - 1][k];
                }
                lcnt[0] = bin_cnt[a][0];
                rcnt[BINS - 1] = bin_cnt[a][BINS - 1];
                for (int b = 1; b < BINS; b++) {
                    lcnt[b] = lcnt[b - 1] + bin_cnt[a][b];
                    rcnt[BINS - 1 - b] = rcnt[BINS - b] + bin_cnt[a][BINS - 1 - b];
                    for (int k = 0; k < 3; k++) {
                        lmin[b][k] = fmin3(lmin[b - 1][k], bin_min[a][b][k]);
                        lmax[b][k] = fmax3(lmax[b - 1][k], bin_max[a][b][k]);
                        rmin[BINS-1-b][k] = fmin3(rmin[BINS-b][k], bin_min[a][BINS-1-b][k]);
                        rmax[BINS-1-b][k] = fmax3(rmax[BINS-b][k], bin_max[a][BINS-1-b][k]);
                    }
                }
                for (int b = 0; b < BINS - 1; b++) {
                    if (lcnt[b] == 0 || rcnt[b + 1] == 0) continue;
                    float cost = half_area(lmin[b], lmax[b]) * lcnt[b]
                               + half_area(rmin[b + 1], rmax[b + 1]) * rcnt[b + 1];
                    if (cost < best_cost) {
                        best_cost = cost;
                        best_axis = a;
                        best_bin = b;
                    }
                }
            }
        }

        int make_leaf = 1;
        if (best_axis >= 0) {
            float r_sav = 1.0f / (half_area(nmn, nmx) + 1e-30f);
            float split_cost = C_TRAV + C_INT * r_sav * best_cost;
            float no_split = C_INT * (float)cnt;
            make_leaf = (cnt <= 1) || (split_cost >= no_split);
            if (make_leaf && c->max_leaf > 0 && cnt > c->max_leaf)
                make_leaf = 0;
        } else if (c->max_leaf > 0 && cnt > c->max_leaf) {
            make_leaf = 0; /* forced median split below */
        }

        if (make_leaf || sp >= 126) {
            c->left_first[node] = start;
            c->count[node] = cnt;
            continue;
        }

        /* partition prim[start:start+cnt] */
        int32_t mid;
        if (best_axis >= 0) {
            int32_t i = start, j = start + cnt - 1;
            while (i <= j) {
                const float *ce = c->cent + 3 * c->prim[i];
                int b = (int)((ce[best_axis] - cbmin[best_axis]) * scale[best_axis]);
                if (b < 0) b = 0;
                if (b >= BINS) b = BINS - 1;
                if (b <= best_bin) i++;
                else { int32_t tmp = c->prim[i]; c->prim[i] = c->prim[j]; c->prim[j] = tmp; j--; }
            }
            mid = i;
        } else mid = start + cnt / 2; /* degenerate: halve */
        if (mid == start || mid == start + cnt) mid = start + cnt / 2;

        int32_t l = c->n_used;
        c->n_used += 2;
        c->left_first[node] = l;
        c->count[node] = 0;
        /* child bounds: exact fragment bounds (tight; the reference uses
         * binned bounds — exact is equal or tighter) */
        for (int side = 0; side < 2; side++) {
            int32_t s = side == 0 ? start : mid;
            int32_t e = side == 0 ? mid : start + cnt;
            float *cm = c->node_min + 3 * (l + side);
            float *cx = c->node_max + 3 * (l + side);
            cm[0] = cm[1] = cm[2] = FLT_MAX;
            cx[0] = cx[1] = cx[2] = -FLT_MAX;
            for (int32_t i = s; i < e; i++) {
                const float *fm = c->fmin + 3 * c->prim[i];
                const float *fx = c->fmax + 3 * c->prim[i];
                for (int k = 0; k < 3; k++) {
                    cm[k] = fmin3(cm[k], fm[k]);
                    cx[k] = fmax3(cx[k], fx[k]);
                }
            }
        }
        stack[sp++] = (task_t){l, start, mid - start};
        stack[sp++] = (task_t){l + 1, mid, start + cnt - mid};
    }
}

/* Entry point. tris: (n, 9) floats. Outputs sized by caller:
 * node_min/node_max (2n+2, 3), left_first/count (2n+2), prim_idx (n),
 * scratch fmin/fmax/cent (n, 3). Returns used node count. */
int32_t tinybvh_build_binned(
    const float *tris, int32_t n, int32_t max_leaf,
    float *node_min, float *node_max,
    int32_t *left_first, int32_t *count, int32_t *prim_idx,
    float *fmin, float *fmax, float *cent)
{
    for (int32_t i = 0; i < n; i++) {
        const float *t = tris + 9 * i;
        for (int k = 0; k < 3; k++) {
            float mn = fmin3(t[k], fmin3(t[3 + k], t[6 + k]));
            float mx = fmax3(t[k], fmax3(t[3 + k], t[6 + k]));
            fmin[3 * i + k] = mn;
            fmax[3 * i + k] = mx;
            cent[3 * i + k] = 0.5f * (mn + mx);
        }
        prim_idx[i] = i;
    }
    /* root bounds */
    float *rm = node_min, *rx = node_max;
    rm[0] = rm[1] = rm[2] = FLT_MAX;
    rx[0] = rx[1] = rx[2] = -FLT_MAX;
    for (int32_t i = 0; i < n; i++)
        for (int k = 0; k < 3; k++) {
            rm[k] = fmin3(rm[k], fmin[3 * i + k]);
            rx[k] = fmax3(rx[k], fmax[3 * i + k]);
        }

    ctx_t c = {fmin, fmax, cent, node_min, node_max,
               left_first, count, prim_idx, 2, max_leaf};
    build_range(&c, 0, 0, n);
    return c.n_used;
}
