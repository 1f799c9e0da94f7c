/*
 * Scripted fake libpulse-simple for driving PulseDevice's state machine
 * in CI (companion of tests/fake_asound.c). Implements the pa_simple_*
 * surface the client uses (io/sound_backends.py PulseDevice; the
 * reference client is bfio_pulse.c):
 *
 *  - pa_simple_new records the connection parameters (server, app name,
 *    direction, device, stream name, sample spec) to the log, returns
 *    NULL with a scripted error when FAKE_PULSE_FAIL_NEW is set;
 *  - capture reads produce the same deterministic per-frame pattern as
 *    the fake ALSA driver; playback writes append to a dump file;
 *  - pa_simple_drain / pa_simple_free are logged so the drain-on-stop
 *    ordering is checkable.
 *
 * Environment: FAKE_PULSE_LOG, FAKE_PULSE_DUMP, FAKE_PULSE_FAIL_NEW.
 */

#include <stdarg.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    int format;
    uint32_t rate;
    uint8_t channels;
} pa_sample_spec;

typedef struct {
    int direction;
    pa_sample_spec ss;
    int frame_bytes;
    long frame_counter;
} fake_pa;

static FILE *log_fp;
static FILE *dump_fp;
static int env_loaded;

void fake_pulse_reset(void) {
    if (log_fp != NULL) { fclose(log_fp); log_fp = NULL; }
    if (dump_fp != NULL) { fclose(dump_fp); dump_fp = NULL; }
    env_loaded = 0;
}

static void load_env(void) {
    if (env_loaded) return;
    env_loaded = 1;
    const char *lp = getenv("FAKE_PULSE_LOG");
    if (lp != NULL) log_fp = fopen(lp, "w");
    const char *dp = getenv("FAKE_PULSE_DUMP");
    if (dp != NULL) dump_fp = fopen(dp, "wb");
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
    case 3: case 4: return 2;              /* S16 */
    case 5: case 6: return 4;              /* FLOAT32 */
    case 7: case 8: return 4;              /* S32 */
    case 9: case 10: return 3;             /* S24 packed */
    case 11: case 12: return 4;            /* S24 in 32 */
    default: return -1;
    }
}

fake_pa *pa_simple_new(const char *server, const char *name, int dir,
                       const char *dev, const char *stream_name,
                       const pa_sample_spec *ss, const void *map,
                       const void *attr, int *error) {
    (void)map; (void)attr;
    load_env();
    logln("new server=%s name=%s dir=%d dev=%s stream=%s "
          "format=%d rate=%u channels=%u",
          server ? server : "(default)", name, dir,
          dev ? dev : "(default)", stream_name,
          ss->format, ss->rate, (unsigned)ss->channels);
    if (getenv("FAKE_PULSE_FAIL_NEW") != NULL) {
        if (error != NULL) *error = 6;     /* PA_ERR_CONNECTIONREFUSED */
        return NULL;
    }
    int fb = fmt_bytes(ss->format);
    if (fb < 0) {
        if (error != NULL) *error = 4;     /* PA_ERR_INVALID */
        return NULL;
    }
    fake_pa *p = calloc(1, sizeof(fake_pa));
    p->direction = dir;
    p->ss = *ss;
    p->frame_bytes = fb * (int)ss->channels;
    return p;
}

int pa_simple_read(fake_pa *p, void *buf, size_t nbytes, int *error) {
    (void)error;
    unsigned long frames = nbytes / (unsigned long)p->frame_bytes;
    logln("read frames=%lu", frames);
    unsigned char *b = buf;
    int fb = p->frame_bytes / (int)p->ss.channels;
    for (unsigned long f = 0; f < frames; f++) {
        for (unsigned int c = 0; c < p->ss.channels; c++) {
            unsigned char v =
                (unsigned char)((p->frame_counter + f + c) & 0xFF);
            for (int k = 0; k < fb; k++) *b++ = (k == 0) ? v : 0;
        }
    }
    p->frame_counter += (long)frames;
    return 0;
}

int pa_simple_write(fake_pa *p, const void *buf, size_t nbytes, int *error) {
    (void)error;
    logln("write frames=%lu", nbytes / (unsigned long)p->frame_bytes);
    if (dump_fp != NULL) {
        fwrite(buf, 1, nbytes, dump_fp);
        fflush(dump_fp);
    }
    return 0;
}

int pa_simple_drain(fake_pa *p, int *error) {
    (void)p; (void)error;
    logln("drain");
    return 0;
}

void pa_simple_free(fake_pa *p) {
    logln("free");
    free(p);
}
