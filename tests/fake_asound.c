/*
 * Scripted fake libasound for driving AlsaDevice's state machine in CI
 * (the live-server analog of the fake JACK driver that validates the
 * native rtfifo path). Implements exactly the snd_pcm_* surface the
 * client uses (io/sound_backends.py AlsaDevice; the reference client is
 * bfio_alsa.c), with real ALSA error semantics:
 *
 *  - reads/writes before snd_pcm_hw_params commits fail with -EBADFD,
 *    as does using the wrong access-mode API (readi on a noninterleaved
 *    pcm, readn on an interleaved one);
 *  - an injected xrun makes readi/readn/writei/writen return -EPIPE
 *    until snd_pcm_prepare is called (bfio_alsa.c:555-586 recovery
 *    contract);
 *  - capture data is a deterministic per-frame pattern; playback data is
 *    appended to a dump file for byte-level verification.
 *
 * Environment:
 *   FAKE_ASOUND_LOG    - call-trace file (one line per API call)
 *   FAKE_ASOUND_DUMP   - playback capture file (raw bytes; noninterleaved
 *                        writes are interleaved first, so the dump is
 *                        always the frames-x-channels wire record)
 *   FAKE_ASOUND_XRUN   - "r:N" / "w:N": inject one xrun on the Nth
 *                        read/write call (1-based)
 *   FAKE_ASOUND_ACCESS - "noninterleaved": hw_params_set_access refuses
 *                        RW_INTERLEAVED, forcing the client's fallback
 *                        (bfio_alsa.c:149-166)
 *   FAKE_ASOUND_RATE   - force set_rate_near to report this rate
 */

#include <errno.h>
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct fake_pcm {
    int stream;            /* 0 = playback, 1 = capture */
    int params_set;
    int started;
    int xrun;              /* sticky until prepare */
    int access;            /* 3 = RW_INTERLEAVED, 4 = RW_NONINTERLEAVED */
    unsigned int channels;
    unsigned int rate;
    int format;
    int frame_bytes;
    unsigned long period_size;
    long read_calls;
    long write_calls;
    long frame_counter;    /* capture pattern position */
    struct fake_pcm *linked_to;   /* link-group base (snd_pcm_link) */
} fake_pcm;

/* staged hw/sw configuration (snd_pcm_hw_params_t analog): setters fill
 * it in, snd_pcm_hw_params() commits it into the pcm */
typedef struct fake_hwp {
    int access;
    int format;
    unsigned int channels;
    unsigned int rate;
    unsigned long period_size;
} fake_hwp;

typedef struct fake_swp {
    unsigned long start_threshold;
    unsigned long stop_threshold;
    unsigned long avail_min;
} fake_swp;

#define MAX_PCMS 32
#define FAKE_PERIODS 4            /* periods the "hardware" provides */
static fake_pcm *pcms[MAX_PCMS];  /* open-handle registry (linked start) */

static FILE *log_fp;
static FILE *dump_fp;
static int xrun_on_read = -1, xrun_on_write = -1;
static int refuse_interleaved;
static unsigned int force_rate;
static int env_loaded;

/* test hook: re-read the environment (dlopen caches the library in the
 * process, so each test re-arms the script through this) */
void fake_asound_reset(void) {
    if (log_fp != NULL) { fclose(log_fp); log_fp = NULL; }
    if (dump_fp != NULL) { fclose(dump_fp); dump_fp = NULL; }
    xrun_on_read = xrun_on_write = -1;
    refuse_interleaved = 0;
    force_rate = 0;
    env_loaded = 0;
    memset(pcms, 0, sizeof(pcms));
}

static void load_env(void) {
    if (env_loaded) return;
    env_loaded = 1;
    const char *lp = getenv("FAKE_ASOUND_LOG");
    if (lp != NULL) log_fp = fopen(lp, "w");
    const char *dp = getenv("FAKE_ASOUND_DUMP");
    if (dp != NULL) dump_fp = fopen(dp, "wb");
    const char *xr = getenv("FAKE_ASOUND_XRUN");
    if (xr != NULL && xr[1] == ':') {
        if (xr[0] == 'r') xrun_on_read = atoi(xr + 2);
        if (xr[0] == 'w') xrun_on_write = atoi(xr + 2);
    }
    const char *ac = getenv("FAKE_ASOUND_ACCESS");
    if (ac != NULL && strcmp(ac, "noninterleaved") == 0)
        refuse_interleaved = 1;
    const char *fr = getenv("FAKE_ASOUND_RATE");
    if (fr != NULL) force_rate = (unsigned int)atoi(fr);
}

static void logln(const char *fmt, ...) {
    if (log_fp == NULL) return;
    va_list ap;
    va_start(ap, fmt);
    vfprintf(log_fp, fmt, ap);
    va_end(ap);
    fputc('\n', log_fp);
    fflush(log_fp);
}

static int fmt_bytes(int format) {
    switch (format) {
    case 0: return 1;                      /* S8 */
    case 2: case 3: return 2;              /* S16 */
    case 32: case 33: return 3;            /* S24 3-byte */
    case 6: case 7: case 10: case 11:
    case 14: case 15: return 4;            /* S24_4 / S32 / FLOAT */
    case 16: case 17: return 8;            /* FLOAT64 */
    default: return -1;
    }
}

int snd_pcm_open(fake_pcm **pcm, const char *name, int stream, int mode) {
    load_env();
    logln("open name=%s stream=%d mode=%d", name, stream, mode);
    if (strcmp(name, "fail") == 0) return -ENOENT;
    fake_pcm *p = calloc(1, sizeof(fake_pcm));
    if (p == NULL) return -ENOMEM;
    p->stream = stream;
    for (int i = 0; i < MAX_PCMS; i++) {
        if (pcms[i] == NULL) { pcms[i] = p; break; }
    }
    *pcm = p;
    return 0;
}

/* real semantics: handles in a link group start together on one
 * snd_pcm_start of any member (the client starts the base,
 * bfio_alsa.c:469-486) */
int snd_pcm_link(fake_pcm *base, fake_pcm *other) {
    logln("link base_stream=%d other_stream=%d", base->stream,
          other->stream);
    if (!base->params_set || !other->params_set) return -EBADFD;
    other->linked_to = (base->linked_to != NULL) ? base->linked_to : base;
    return 0;
}

int snd_pcm_state(fake_pcm *p) {
    /* snd_pcm_state_t: OPEN=0 SETUP=1 PREPARED=2 RUNNING=3 */
    if (p->started) return 3;
    return p->params_set ? 2 : 1;
}

/* ---- full hw-params negotiation surface (bfio_alsa.c:141-283 client
 * order: any, set_access w/ noninterleaved fallback, set_rate_near,
 * set_format, set_channels, periods_max, period_size_near, commit) ---- */

int snd_pcm_hw_params_malloc(fake_hwp **p) {
    load_env();
    *p = calloc(1, sizeof(fake_hwp));
    return (*p == NULL) ? -ENOMEM : 0;
}

void snd_pcm_hw_params_free(fake_hwp *p) { free(p); }

int snd_pcm_hw_params_any(fake_pcm *pcm, fake_hwp *hw) {
    (void)pcm;
    logln("hw_params_any");
    memset(hw, 0, sizeof(*hw));
    return 0;
}

int snd_pcm_hw_params_set_access(fake_pcm *pcm, fake_hwp *hw, int access) {
    (void)pcm;
    logln("set_access access=%d%s", access,
          (access == 3 && refuse_interleaved) ? " -> -EINVAL" : "");
    if (access == 3 && refuse_interleaved) return -EINVAL;
    if (access != 3 && access != 4) return -EINVAL;
    hw->access = access;
    return 0;
}

int snd_pcm_hw_params_set_rate_near(fake_pcm *pcm, fake_hwp *hw,
                                    unsigned int *rate, int *dir) {
    (void)pcm; (void)dir;
    unsigned int got = force_rate ? force_rate : *rate;
    logln("set_rate_near want=%u got=%u", *rate, got);
    hw->rate = got;
    *rate = got;
    return 0;
}

int snd_pcm_hw_params_set_format(fake_pcm *pcm, fake_hwp *hw, int format) {
    (void)pcm;
    logln("set_format format=%d", format);
    if (fmt_bytes(format) < 0) return -EINVAL;
    hw->format = format;
    return 0;
}

int snd_pcm_hw_params_set_channels(fake_pcm *pcm, fake_hwp *hw,
                                   unsigned int channels) {
    (void)pcm;
    logln("set_channels channels=%u", channels);
    hw->channels = channels;
    return 0;
}

int snd_pcm_hw_params_get_periods_max(const fake_hwp *hw, unsigned int *val,
                                      int *dir) {
    (void)hw; (void)dir;
    *val = FAKE_PERIODS;
    return 0;
}

int snd_pcm_hw_params_set_period_size_near(fake_pcm *pcm, fake_hwp *hw,
                                           unsigned long *frames, int *dir) {
    (void)pcm; (void)dir;
    logln("set_period_size_near frames=%lu", *frames);
    hw->period_size = *frames;
    return 0;
}

int snd_pcm_hw_params_get_periods(const fake_hwp *hw, unsigned int *val,
                                  int *dir) {
    (void)hw; (void)dir;
    *val = FAKE_PERIODS;
    return 0;
}

int snd_pcm_hw_params_get_buffer_size(const fake_hwp *hw,
                                      unsigned long *frames) {
    *frames = hw->period_size * FAKE_PERIODS;
    return 0;
}

int snd_pcm_hw_params(fake_pcm *p, fake_hwp *hw) {
    int fb = fmt_bytes(hw->format);
    logln("hw_params access=%d format=%d channels=%u rate=%u period=%lu",
          hw->access, hw->format, hw->channels, hw->rate, hw->period_size);
    if (fb < 0 || hw->channels == 0 || hw->access == 0) return -EINVAL;
    p->params_set = 1;
    p->access = hw->access;
    p->channels = hw->channels;
    p->rate = hw->rate;
    p->format = hw->format;
    p->period_size = hw->period_size;
    p->frame_bytes = fb * (int)hw->channels;
    return 0;
}

int snd_pcm_sw_params_malloc(fake_swp **p) {
    *p = calloc(1, sizeof(fake_swp));
    return (*p == NULL) ? -ENOMEM : 0;
}

void snd_pcm_sw_params_free(fake_swp *p) { free(p); }

int snd_pcm_sw_params_current(fake_pcm *pcm, fake_swp *sw) {
    (void)pcm;
    memset(sw, 0, sizeof(*sw));
    return 0;
}

int snd_pcm_sw_params_set_start_threshold(fake_pcm *pcm, fake_swp *sw,
                                          unsigned long v) {
    (void)pcm;
    sw->start_threshold = v;
    return 0;
}

int snd_pcm_sw_params_set_stop_threshold(fake_pcm *pcm, fake_swp *sw,
                                         unsigned long v) {
    (void)pcm;
    sw->stop_threshold = v;
    return 0;
}

int snd_pcm_sw_params_set_avail_min(fake_pcm *pcm, fake_swp *sw,
                                    unsigned long v) {
    (void)pcm;
    sw->avail_min = v;
    return 0;
}

int snd_pcm_sw_params(fake_pcm *p, fake_swp *sw) {
    (void)p;
    logln("sw_params start=%lu stop=%lu avail_min=%lu",
          sw->start_threshold, sw->stop_threshold, sw->avail_min);
    return 0;
}

int snd_pcm_prepare(fake_pcm *p) {
    logln("prepare");
    p->xrun = 0;
    return 0;
}

int snd_pcm_start(fake_pcm *p) {
    logln("start");
    if (!p->params_set) return -EBADFD;
    fake_pcm *base = p->linked_to ? p->linked_to : p;
    base->started = 1;
    for (int i = 0; i < MAX_PCMS; i++) {
        if (pcms[i] != NULL && pcms[i]->linked_to == base)
            pcms[i]->started = 1;
    }
    return 0;
}

long snd_pcm_readi(fake_pcm *p, void *buf, unsigned long frames) {
    if (!p->params_set || p->access != 3) return -EBADFD;
    p->read_calls++;
    if (p->read_calls == xrun_on_read) p->xrun = 1;
    if (p->xrun) {
        logln("readi frames=%lu -> -EPIPE", frames);
        return -EPIPE;
    }
    logln("readi frames=%lu", frames);
    /* deterministic pattern: sample s of frame f, channel c is the
       byte (f + c) & 0xFF replicated through the sample width */
    unsigned char *b = buf;
    int fb = p->frame_bytes / (int)p->channels;
    for (unsigned long f = 0; f < frames; f++) {
        for (unsigned int c = 0; c < p->channels; c++) {
            unsigned char v =
                (unsigned char)((p->frame_counter + f + c) & 0xFF);
            for (int k = 0; k < fb; k++) *b++ = (k == 0) ? v : 0;
        }
    }
    p->frame_counter += (long)frames;
    return (long)frames;
}

/* noninterleaved capture: same pattern, one plane per channel
 * (the client re-interleaves, so reads through either access mode must
 * yield identical wire bytes) */
long snd_pcm_readn(fake_pcm *p, void **bufs, unsigned long frames) {
    if (!p->params_set || p->access != 4) return -EBADFD;
    p->read_calls++;
    if (p->read_calls == xrun_on_read) p->xrun = 1;
    if (p->xrun) {
        logln("readn frames=%lu -> -EPIPE", frames);
        return -EPIPE;
    }
    logln("readn frames=%lu", frames);
    int fb = p->frame_bytes / (int)p->channels;
    for (unsigned int c = 0; c < p->channels; c++) {
        unsigned char *b = bufs[c];
        for (unsigned long f = 0; f < frames; f++) {
            unsigned char v =
                (unsigned char)((p->frame_counter + f + c) & 0xFF);
            for (int k = 0; k < fb; k++) *b++ = (k == 0) ? v : 0;
        }
    }
    p->frame_counter += (long)frames;
    return (long)frames;
}

long snd_pcm_writei(fake_pcm *p, const void *buf, unsigned long frames) {
    if (!p->params_set || p->access != 3) return -EBADFD;
    p->write_calls++;
    if (p->write_calls == xrun_on_write) p->xrun = 1;
    if (p->xrun) {
        logln("writei frames=%lu -> -EPIPE", frames);
        return -EPIPE;
    }
    logln("writei frames=%lu", frames);
    if (dump_fp != NULL) {
        fwrite(buf, 1, frames * (unsigned long)p->frame_bytes, dump_fp);
        fflush(dump_fp);
    }
    return (long)frames;
}

/* noninterleaved playback: interleave the planes so the dump file is
 * always the frames-x-channels wire record ("what the speaker got"),
 * independent of the negotiated access mode */
long snd_pcm_writen(fake_pcm *p, void **bufs, unsigned long frames) {
    if (!p->params_set || p->access != 4) return -EBADFD;
    p->write_calls++;
    if (p->write_calls == xrun_on_write) p->xrun = 1;
    if (p->xrun) {
        logln("writen frames=%lu -> -EPIPE", frames);
        return -EPIPE;
    }
    logln("writen frames=%lu", frames);
    if (dump_fp != NULL) {
        int fb = p->frame_bytes / (int)p->channels;
        for (unsigned long f = 0; f < frames; f++) {
            for (unsigned int c = 0; c < p->channels; c++)
                fwrite((const unsigned char *)bufs[c] + f * (unsigned long)fb,
                       1, (size_t)fb, dump_fp);
        }
        fflush(dump_fp);
    }
    return (long)frames;
}

int snd_pcm_close(fake_pcm *p) {
    logln("close");
    for (int i = 0; i < MAX_PCMS; i++) {
        if (pcms[i] == p) pcms[i] = NULL;
        else if (pcms[i] != NULL && pcms[i]->linked_to == p)
            pcms[i]->linked_to = NULL;  /* base gone: group dissolves */
    }
    free(p);
    return 0;
}
