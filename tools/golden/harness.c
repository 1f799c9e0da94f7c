/*
 * Golden-vector harness: compiles the REFERENCE implementation's
 * bit-level kernels (dither.c Tausworthe table + randmap,
 * dither_funs.h HP-TPDF quantizers, raw2real.h / real2raw.h format
 * converters) straight from /root/reference via -I, drives them with
 * deterministic inputs, and dumps the results as binary vectors +
 * a JSON manifest. The rebuild's test suite asserts bit-equality of
 * its Python/C++/device implementations against these files, so the
 * "bit-faithful" claims are backed by reference-compiled truth rather
 * than re-derivations (VERDICT r2 item 2).
 *
 * No FFTW needed: none of these kernels touch the transform.
 *
 * Build/run: python tools/golden/gen_golden.py  (gcc -I$REF harness.c)
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "defs.h"
#include "bfmod.h"
#include "bfconf.h"
#include "numunion.h"
#include "swap.h"
#include "dither.h"
#include "firwindow.h"
#include "delay.h"

/* ---- minimal runtime the reference files expect ---- */

struct bfconf *bfconf;

/* delay.c's subsample half needs the td convolver; the integer-delay
   goldens never call it -- stub to satisfy the linker */
typedef struct _td_conv_t_ td_conv_t;
int convolver_td_block_length(int n_coeffs) { (void)n_coeffs; abort(); }
td_conv_t *convolver_td_new(void *coeffs, int n_coeffs) {
    (void)coeffs; (void)n_coeffs; abort();
}
void convolver_td_convolve(td_conv_t *tdc, void *overlap_block) {
    (void)tdc; (void)overlap_block; abort();
}

void bf_exit(int code) { exit(code); }

void *emalloc(size_t n) {
    void *p = malloc(n);
    if (p == NULL) abort();
    return p;
}

void *emallocaligned(size_t n) {
    void *p = NULL;
    if (posix_memalign(&p, ALIGNMENT, n) != 0) abort();
    return p;
}

void *erealloc(void *p, size_t n) {
    p = realloc(p, n);
    if (p == NULL) abort();
    return p;
}

char *estrdup(const char s[]) { return strdup(s); }

void emalloc_set_exit_function(void (*f)(int), int s) { (void)f; (void)s; }

void efree(void *p) { free(p); }

/* ---- instantiate the reference converter templates, exactly as
 *      fftw_convolver.c:128-168 and 435-479 do ---- */

#define real_t float
#define REALSIZE 4
#define RAW2REAL_NAME raw2realf
#include "raw2real.h"
#undef RAW2REAL_NAME

#define REAL2RAW_NAME real2rawf_hp_tpdf
#define REAL2INT_CALL ditherf_real2int_hp_tpdf(((float *)realbuf)[n], rmin,    \
                                               rmax, imin, imax, overflow,     \
                                               dither_state, n)
#define REAL2RAW_EXTRA_PARAMS , struct dither_state *dither_state
#include "real2raw.h"
#undef REAL2RAW_NAME
#undef REAL2INT_CALL
#undef REAL2RAW_EXTRA_PARAMS

#define REAL2RAW_NAME real2rawf_no_dither
#define REAL2INT_CALL ditherd_real2int_no_dither(((float *)realbuf)[n], rmin,  \
                                                 rmax, imin, imax, overflow)
#define REAL2RAW_EXTRA_PARAMS
#include "real2raw.h"
#undef REAL2RAW_NAME
#undef REAL2INT_CALL
#undef REAL2RAW_EXTRA_PARAMS
#undef REALSIZE
#undef real_t

#define real_t double
#define REALSIZE 8
#define RAW2REAL_NAME raw2reald
#include "raw2real.h"
#undef RAW2REAL_NAME

#define REAL2RAW_NAME real2rawd_hp_tpdf
#define REAL2INT_CALL ditherd_real2int_hp_tpdf(((double *)realbuf)[n], rmin,   \
                                               rmax, imin, imax, overflow,     \
                                               dither_state, n)
#define REAL2RAW_EXTRA_PARAMS , struct dither_state *dither_state
#include "real2raw.h"
#undef REAL2RAW_NAME
#undef REAL2INT_CALL
#undef REAL2RAW_EXTRA_PARAMS

#define REAL2RAW_NAME real2rawd_no_dither
#define REAL2INT_CALL ditherd_real2int_no_dither(((double *)realbuf)[n], rmin, \
                                                 rmax, imin, imax, overflow)
#define REAL2RAW_EXTRA_PARAMS
#include "real2raw.h"
#undef REAL2RAW_NAME
#undef REAL2INT_CALL
#undef REAL2RAW_EXTRA_PARAMS
#undef REALSIZE
#undef real_t

/* ---- vector generation ---- */

static const char *outdir;
static FILE *manifest;
static int manifest_first = 1;

static void
dump(const char *name, const void *buf, size_t nbytes)
{
    char path[4096];
    snprintf(path, sizeof path, "%s/%s.bin", outdir, name);
    FILE *f = fopen(path, "wb");
    if (f == NULL || fwrite(buf, 1, nbytes, f) != nbytes) abort();
    fclose(f);
}

static void
manifest_entry(const char *name, const char *kind, int bits, int bytes,
               int isfloat, int spacing, int swap, int n_samples,
               int block, int channel, const struct bfoverflow *o)
{
    fprintf(manifest, "%s\n  \"%s\": {\"kind\": \"%s\", \"bits\": %d, "
            "\"bytes\": %d, \"isfloat\": %d, \"spacing\": %d, \"swap\": %d, "
            "\"n_samples\": %d, \"block\": %d, \"channel\": %d",
            manifest_first ? "{" : ",", name, kind, bits, bytes, isfloat,
            spacing, swap, n_samples, block, channel);
    manifest_first = 0;
    if (o != NULL) {
        fprintf(manifest, ", \"n_overflows\": %u, \"intlargest\": %d, "
                "\"largest\": %.17g", o->n_overflows, o->intlargest,
                o->largest);
    }
    fprintf(manifest, "}");
}

/*
 * The reference's randmap covers tab-byte differences [-256, 254] only
 * (dither.c:112-131), but a difference of +255 (tab 127 after -128) IS
 * reachable and reads one float past the allocation -- an upstream
 * out-of-bounds read whose value is unspecified heap garbage. To make the
 * golden vectors deterministic, pin that word to the rebuild's documented
 * continuation value (core/dither.py build_randmap: 1.5 + 1/255); every
 * other sample of every sequence exercises the reference's real code.
 */
static void
pin_randmap_oob(void)
{
    float *fresh = emallocaligned(sizeof(float) * 512);
    memcpy(fresh, ((float *)dither_randmap) - 256, sizeof(float) * 511);
    fresh[511] = (float)(1.5 + 1.0 / 255.0);
    dither_randmap = &fresh[256];
}

/* deterministic base signal in [-1.25, 1.25): sign-extended 24-bit values
   drawn from the shared random table (bit-exactly reproducible in numpy) */
static void
make_base(float *base, int n)
{
    int i;
    for (i = 0; i < n; i++) {
        int32_t w = ((int32_t)(uint8_t)dither_randtab[3 * i] |
                     ((int32_t)(uint8_t)dither_randtab[3 * i + 1] << 8) |
                     ((int32_t)(uint8_t)dither_randtab[3 * i + 2] << 16));
        w = (w << 8) >> 8;
        base[i] = (float)((double)w / 8388608.0 * 1.25);
    }
}

#define NBLOCK 256
#define NBLOCKS 8
#define NTOT (NBLOCK * NBLOCKS)

static void
dither_case(const char *name, int bits, int bytes, int spacing, int swap,
            struct dither_state *st, int channel, const float *base)
{
    float x[NTOT];
    uint8_t raw[NTOT * 8];
    struct bfoverflow o;
    int b, n;
    int32_t imax = (int32_t)(((uint64_t)1 << (bits - 1)) - 1);

    memset(raw, 0, sizeof raw);
    memset(&o, 0, sizeof o);
    o.max = (double)imax;
    for (n = 0; n < NTOT; n++)
        x[n] = (float)imax * base[n];
    {
        char iname[128];
        snprintf(iname, sizeof iname, "%s_in", name);
        dump(iname, x, NTOT * sizeof(float));
    }
    for (b = 0; b < NBLOCKS; b++) {
        dither_preloop_real2int_hp_tpdf(st, NBLOCK);
        real2rawf_hp_tpdf(&raw[(size_t)b * NBLOCK * bytes * spacing],
                          &x[b * NBLOCK], bits, bytes, 0, spacing, swap,
                          NBLOCK, &o, st);
    }
    dump(name, raw, (size_t)NTOT * bytes * spacing);
    manifest_entry(name, "dither", bits, bytes, 0, spacing, swap, NTOT,
                   NBLOCK, channel, &o);
}

static void
nodither_case(const char *name, int bits, int bytes, int isfloat, int spacing,
              int swap, const float *base)
{
    float x[NTOT];
    uint8_t raw[NTOT * 2 * 8];
    struct bfoverflow o;
    int n;
    double scale = isfloat ? 1.0
        : (double)(((uint64_t)1 << (bits - 1)) - 1);

    memset(raw, 0, sizeof raw);
    memset(&o, 0, sizeof o);
    o.max = scale;
    for (n = 0; n < NTOT; n++)
        x[n] = (float)(scale * base[n]);
    {
        char iname[128];
        snprintf(iname, sizeof iname, "%s_in", name);
        dump(iname, x, NTOT * sizeof(float));
    }
    real2rawf_no_dither(raw, x, bits, bytes, isfloat, spacing, swap, NTOT,
                        &o);
    dump(name, raw, (size_t)NTOT * bytes * spacing);
    manifest_entry(name, "nodither", bits, bytes, isfloat, spacing, swap,
                   NTOT, 0, -1, &o);
}

static void
raw2real_case(const char *name, int bytes, int isfloat, int spacing, int swap)
{
    /* raw input: for int formats, bytes straight from the random table;
       for float formats, in-range values built from 16-bit words so the
       f64->f32 narrowing is NaN-free */
    uint8_t raw[NTOT * 8 * 2];
    float out[NTOT];
    int n;

    memset(raw, 0, sizeof raw);
    if (isfloat) {
        for (n = 0; n < NTOT; n++) {
            int16_t w = (int16_t)((uint8_t)dither_randtab[2 * n] |
                                  ((uint8_t)dither_randtab[2 * n + 1] << 8));
            double v = (double)w / 32768.0;
            if (bytes == 4) {
                numunion_t u;
                u.r32[0] = (float)v;
                if (swap) u.u32[0] = SWAP32(u.u32[0]);
                memcpy(&raw[(size_t)n * 4 * spacing], u.u8, 4);
            } else {
                numunion_t u;
                u.r64[0] = v;
                if (swap) u.u64[0] = SWAP64(u.u64[0]);
                memcpy(&raw[(size_t)n * 8 * spacing], u.u8, 8);
            }
        }
    } else if (bytes == 4) {
        /* sign-extended 24-in-32 or full 32-bit words from table bytes */
        for (n = 0; n < NTOT; n++) {
            int32_t w = ((int32_t)(uint8_t)dither_randtab[3 * n] |
                         ((int32_t)(uint8_t)dither_randtab[3 * n + 1] << 8) |
                         ((int32_t)(uint8_t)dither_randtab[3 * n + 2] << 16));
            w = (w << 8) >> 8;
            numunion_t u;
            u.i32[0] = w;
            if (swap) u.u32[0] = SWAP32(u.u32[0]);
            memcpy(&raw[(size_t)n * 4 * spacing], u.u8, 4);
        }
    } else {
        for (n = 0; n < NTOT * bytes * spacing; n++)
            raw[n] = (uint8_t)dither_randtab[n % (dither_randtab_size - 1)];
    }
    {
        char iname[128];
        snprintf(iname, sizeof iname, "%s_raw", name);
        dump(iname, raw, (size_t)NTOT * bytes * spacing);
    }
    raw2realf(out, raw, bytes, isfloat, spacing, swap, NTOT);
    dump(name, out, NTOT * sizeof(float));
    manifest_entry(name, "raw2real", 0, bytes, isfloat, spacing, swap, NTOT,
                   0, -1, NULL);
}

/* ---- integer delay engine (delay.c:228-407) ----
 * Streams float32 fragments through delay_update with a per-fragment
 * delay schedule, capturing the reference's exact runtime-change
 * semantics (change_delay's history zeroing on increase and
 * stale-buffer replay on decrease). */
static void
delay_case(const char *name, int frag, int initdelay, int maxdelay,
           const int *sched, int nsched, const float *base)
{
    delaybuffer_t *db;
    float *stream;
    int total = nsched * frag;
    int b, n;

    db = delay_allocate_buffer(frag, initdelay, maxdelay, sizeof(float));
    stream = emalloc((size_t)total * sizeof(float));
    for (n = 0; n < total; n++)
        stream[n] = base[n % NTOT];
    {
        char iname[128];
        snprintf(iname, sizeof iname, "%s_in", name);
        dump(iname, stream, (size_t)total * sizeof(float));
    }
    for (b = 0; b < nsched; b++)
        delay_update(db, &stream[(size_t)b * frag], sizeof(float), 1,
                     sched[b], NULL);
    dump(name, stream, (size_t)total * sizeof(float));
    fprintf(manifest, ",\n  \"%s\": {\"kind\": \"delay\", \"frag\": %d, "
            "\"initdelay\": %d, \"maxdelay\": %d, \"sched\": [",
            name, frag, initdelay, maxdelay);
    for (b = 0; b < nsched; b++)
        fprintf(manifest, "%s%d", b ? ", " : "", sched[b]);
    fprintf(manifest, "]}");
    free(stream);
}

int
main(int argc, char *argv[])
{
    struct dither_state *states[8];
    float base[NTOT];
    int n;

    if (argc != 2) {
        fprintf(stderr, "usage: %s <outdir>\n", argv[0]);
        return 1;
    }
    outdir = argv[1];
    {
        char path[4096];
        snprintf(path, sizeof path, "%s/manifest.json", outdir);
        manifest = fopen(path, "w");
        if (manifest == NULL) abort();
    }

    bfconf = calloc(1, sizeof *bfconf);
    bfconf->quiet = 1;
    bfconf->safety_limit = 0.0;

    /* table sized like the engine would for 6 channels at 8 kHz with
       max_dither_table_size 60000 and 256-sample blocks:
       spacing = 10000, size = 60001 */
    if (!dither_init(6, 8000, 4, 60000, NBLOCK, states)) abort();
    pin_randmap_oob();
    dump("randtab", dither_randtab, dither_randtab_size);
    manifest_entry("randtab", "randtab", 0, 0, 0, 6, 0,
                   dither_randtab_size, NBLOCK, -1, NULL);
    fprintf(manifest, ", \"randtab_params\": {\"n_channels\": 6, "
            "\"sample_rate\": 8000, \"max_size\": 60000, "
            "\"max_samples_per_loop\": %d, \"spacing\": 10000}", NBLOCK);
    for (n = 0; n < 6; n++)
        fprintf(manifest, ", \"randtab_ptr_%d\": %d", n,
                states[n]->randtab_ptr);

    make_base(base, NTOT);
    dump("base", base, sizeof base);

    dither_case("dither_s16le", 16, 2, 1, 0, states[0], 0, base);
    dither_case("dither_s8", 8, 1, 1, 0, states[1], 1, base);
    dither_case("dither_s24_3le", 24, 3, 1, 0, states[2], 2, base);
    dither_case("dither_s24_4le", 24, 4, 1, 0, states[3], 3, base);
    dither_case("dither_s16be", 16, 2, 1, 1, states[4], 4, base);
    dither_case("dither_s16le_sp2", 16, 2, 2, 0, states[5], 5, base);

    nodither_case("nd_s8", 8, 1, 0, 1, 0, base);
    nodither_case("nd_s16le", 16, 2, 0, 1, 0, base);
    nodither_case("nd_s16be", 16, 2, 0, 1, 1, base);
    nodither_case("nd_s24_3le", 24, 3, 0, 1, 0, base);
    nodither_case("nd_s24_3be", 24, 3, 0, 1, 1, base);
    nodither_case("nd_s24_3le_sp2", 24, 3, 0, 2, 0, base);
    nodither_case("nd_s24_4le", 24, 4, 0, 1, 0, base);
    nodither_case("nd_s32le", 32, 4, 0, 1, 0, base);
    nodither_case("nd_s32be", 32, 4, 0, 1, 1, base);
    nodither_case("nd_f32le", 32, 4, 1, 1, 0, base);
    nodither_case("nd_f32be", 32, 4, 1, 1, 1, base);
    nodither_case("nd_f64le", 64, 8, 1, 1, 0, base);

    raw2real_case("r2r_s8", 1, 0, 1, 0);
    raw2real_case("r2r_s16le", 2, 0, 1, 0);
    raw2real_case("r2r_s16be", 2, 0, 1, 1);
    raw2real_case("r2r_s24_3le", 3, 0, 1, 0);
    raw2real_case("r2r_s24_3be", 3, 0, 1, 1);
    raw2real_case("r2r_s24_3le_sp2", 3, 0, 2, 0);
    raw2real_case("r2r_s32le", 4, 0, 1, 0);
    raw2real_case("r2r_s32be", 4, 0, 1, 1);
    raw2real_case("r2r_f32le", 4, 1, 1, 0);
    raw2real_case("r2r_f32be", 4, 1, 1, 1);
    raw2real_case("r2r_f64le", 8, 1, 1, 0);

    /* table-wrap case: a second, tiny table (1 channel, spacing 8001)
       quantizing enough blocks to wrap the pointer (dither.h:28-38) */
    {
        struct dither_state *wstates[1];
        struct bfoverflow o;
        float x[NBLOCK];
        uint8_t raw[40 * NBLOCK * 2];
        int b;
        if (!dither_init(1, 8000, 4, 8001, NBLOCK, wstates)) abort();
        pin_randmap_oob();
        dump("randtab_wrap", dither_randtab, dither_randtab_size);
        memset(&o, 0, sizeof o);
        o.max = 32767.0;
        for (b = 0; b < 40; b++) {
            for (n = 0; n < NBLOCK; n++)
                x[n] = 32767.0f * base[(b * NBLOCK + n) % NTOT] * 0.5f;
            dither_preloop_real2int_hp_tpdf(wstates[0], NBLOCK);
            real2rawf_hp_tpdf(&raw[(size_t)b * NBLOCK * 2], x, 16, 2, 0, 1,
                              0, NBLOCK, &o, wstates[0]);
        }
        dump("dither_wrap_s16le", raw, sizeof raw);
        manifest_entry("dither_wrap_s16le", "dither_wrap", 16, 2, 0, 1, 0,
                       40 * NBLOCK, NBLOCK, 0, &o);
        fprintf(manifest, ", \"wrap_params\": {\"n_channels\": 1, "
                "\"sample_rate\": 8000, \"max_size\": 8001, "
                "\"max_samples_per_loop\": %d, \"randtab_size\": %d}",
                NBLOCK, dither_randtab_size);
    }

    /* Kaiser windows (firwindow.c firwindow_kaiser, incl. the
       fractional-offset branch that applies the window twice): windows
       over a ones vector for a sweep of (len, offset, beta) x f32/f64 */
    {
        static const struct { int len; double offset; double beta; }
        wcases[] = {
            {63, 0.0, 9.0}, {64, 0.0, 9.0}, {63, 0.25, 9.0},
            {64, -0.37, 5.0}, {127, 0.499, 16.0}, {32, 0.0, 2.5},
        };
        int wi;
        fprintf(manifest, ", \"kaiser_cases\": [");
        for (wi = 0; wi < 6; wi++) {
            char nm[64];
            int len = wcases[wi].len;
            float *tf = malloc(sizeof(float) * len);
            double *td = malloc(sizeof(double) * len);
            for (n = 0; n < len; n++) { tf[n] = 1.0f; td[n] = 1.0; }
            firwindow_kaiser(tf, len, wcases[wi].offset, wcases[wi].beta, 4);
            firwindow_kaiser(td, len, wcases[wi].offset, wcases[wi].beta, 8);
            snprintf(nm, sizeof nm, "kaiser_%d_f32", wi);
            dump(nm, tf, sizeof(float) * len);
            snprintf(nm, sizeof nm, "kaiser_%d_f64", wi);
            dump(nm, td, sizeof(double) * len);
            fprintf(manifest, "%s{\"len\": %d, \"offset\": %.17g, "
                    "\"beta\": %.17g}", wi ? ", " : "",
                    len, wcases[wi].offset, wcases[wi].beta);
            free(tf);
            free(td);
        }
        fprintf(manifest, "]");
    }

    /* integer delay goldens */
    {
        /* fixed delays (maxdelay -1: not runtime-changeable) */
        static const int s10[8] = {10, 10, 10, 10, 10, 10, 10, 10};
        static const int s100[8] = {100, 100, 100, 100, 100, 100, 100, 100};
        static const int s64[8] = {64, 64, 64, 64, 64, 64, 64, 64};
        /* runtime schedule: short->long increase, long->long decrease,
           long->short decrease, short->0, 0->long, and the frag-size
           boundary (64 = short path, 65 = long path) */
        static const int sch[25] = {
            10, 10, 10, 130, 130, 130, 130, 70, 70, 70, 3, 3, 3,
            0, 0, 95, 95, 95, 95, 64, 64, 65, 65, 63, 63};
        /* all-short schedule with changes at odd fragment counts, to
           exercise the shortbuf curbuf parity at change time */
        static const int sshort[10] = {5, 5, 2, 2, 2, 7, 1, 1, 0, 5};
        delay_case("delay_fixed10", 64, 10, -1, s10, 8, base);
        delay_case("delay_fixed100", 64, 100, -1, s100, 8, base);
        delay_case("delay_fixed64", 64, 64, -1, s64, 8, base);
        delay_case("delay_sched", 64, 10, 300, sch, 25, base);
        delay_case("delay_sched_short", 64, 5, 60, sshort, 10, base);
        /* init 0 with headroom: buffers exist, delay engaged later */
        static const int sgrow[6] = {0, 0, 40, 40, 150, 150};
        delay_case("delay_grow_from0", 64, 0, 200, sgrow, 6, base);
    }

    fprintf(manifest, "\n}\n");
    fclose(manifest);
    printf("golden vectors written to %s\n", outdir);
    return 0;
}
