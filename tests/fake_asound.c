/*
 * Scripted fake libasound for driving AlsaDevice's state machine in CI
 * (the live-server analog of the fake JACK driver that validates the
 * native rtfifo path). Implements exactly the snd_pcm_* surface the
 * client uses (io/sound_backends.py AlsaDevice; the reference client is
 * bfio_alsa.c), with real ALSA error semantics:
 *
 *  - calls before snd_pcm_set_params fail with -EBADFD;
 *  - an injected xrun makes readi/writei return -EPIPE until
 *    snd_pcm_prepare is called (bfio_alsa.c:555-586 recovery contract);
 *  - capture data is a deterministic per-frame pattern; playback data is
 *    appended to a dump file for byte-level verification.
 *
 * Environment:
 *   FAKE_ASOUND_LOG   - call-trace file (one line per API call)
 *   FAKE_ASOUND_DUMP  - playback capture file (raw bytes)
 *   FAKE_ASOUND_XRUN  - "r:N" / "w:N": inject one xrun on the Nth
 *                       readi/writei call (1-based)
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
    unsigned int channels;
    unsigned int rate;
    int format;
    int frame_bytes;
    long read_calls;
    long write_calls;
    long frame_counter;    /* capture pattern position */
    struct fake_pcm *linked_to;   /* link-group base (snd_pcm_link) */
} fake_pcm;

#define MAX_PCMS 32
static fake_pcm *pcms[MAX_PCMS];  /* open-handle registry (linked start) */

static FILE *log_fp;
static FILE *dump_fp;
static int xrun_on_read = -1, xrun_on_write = -1;
static int env_loaded;

/* test hook: re-read the environment (dlopen caches the library in the
 * process, so each test re-arms the script through this) */
void fake_asound_reset(void) {
    if (log_fp != NULL) { fclose(log_fp); log_fp = NULL; }
    if (dump_fp != NULL) { fclose(dump_fp); dump_fp = NULL; }
    xrun_on_read = xrun_on_write = -1;
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

int snd_pcm_set_params(fake_pcm *p, int format, int access,
                       unsigned int channels, unsigned int rate,
                       int soft_resample, unsigned int latency_us) {
    logln("set_params format=%d access=%d channels=%u rate=%u "
          "soft_resample=%d latency_us=%u",
          format, access, channels, rate, soft_resample, latency_us);
    if (access != 3) return -EINVAL;       /* RW_INTERLEAVED only */
    int fb = fmt_bytes(format);
    if (fb < 0) return -EINVAL;
    p->params_set = 1;
    p->channels = channels;
    p->rate = rate;
    p->format = format;
    p->frame_bytes = fb * (int)channels;
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
    if (!p->params_set) return -EBADFD;
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

long snd_pcm_writei(fake_pcm *p, const void *buf, unsigned long frames) {
    if (!p->params_set) return -EBADFD;
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
