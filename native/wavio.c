/* Native WAV batch decoder for the data pipeline.
 *
 * The reference feeds training through torch DataLoader worker processes
 * (src/data/sc09_datamodule.py); this framework's host-side input pipeline
 * instead uses this small C library (via ctypes) for the hot decode path:
 * RIFF/WAVE parse, PCM16/PCM32/float32 -> float32 [-1,1] conversion,
 * channel-mean downmix, and random-crop/zero-pad to a fixed length --
 * one malloc-free pass per file into a caller-provided batch buffer.
 *
 * Build: cc -O3 -shared -fPIC -o libwavio.so wavio.c
 */

#include <stdint.h>
#include <stdio.h>
#include <string.h>
#include <stdlib.h>

#define WAVIO_OK 0
#define WAVIO_ERR_OPEN -1
#define WAVIO_ERR_FORMAT -2
#define WAVIO_ERR_UNSUPPORTED -3

typedef struct {
    uint16_t audio_format;
    uint16_t num_channels;
    uint32_t sample_rate;
    uint16_t bits_per_sample;
    uint32_t data_offset;
    uint32_t data_bytes;
} wav_info;

static int parse_header(FILE *f, wav_info *info) {
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12) return WAVIO_ERR_FORMAT;
    if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
        return WAVIO_ERR_FORMAT;

    uint8_t chunk[8];
    int have_fmt = 0;
    for (;;) {
        if (fread(chunk, 1, 8, f) != 8) return WAVIO_ERR_FORMAT;
        uint32_t size;
        memcpy(&size, chunk + 4, 4);
        if (memcmp(chunk, "fmt ", 4) == 0) {
            uint8_t fmt[16];
            if (size < 16 || fread(fmt, 1, 16, f) != 16) return WAVIO_ERR_FORMAT;
            memcpy(&info->audio_format, fmt, 2);
            memcpy(&info->num_channels, fmt + 2, 2);
            memcpy(&info->sample_rate, fmt + 4, 4);
            memcpy(&info->bits_per_sample, fmt + 14, 2);
            if (size > 16) fseek(f, size - 16, SEEK_CUR);
            have_fmt = 1;
        } else if (memcmp(chunk, "data", 4) == 0) {
            if (!have_fmt) return WAVIO_ERR_FORMAT;
            info->data_offset = (uint32_t)ftell(f);
            info->data_bytes = size;
            return WAVIO_OK;
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
    }
}

/* Decode one file into out[target_len] (float32), with channel downmix,
 * cropping at crop_start frames (clamped), zero-padding the tail.
 * Returns sample rate (>0) or a WAVIO_ERR_* code. */
int wavio_load(const char *path, float *out, int64_t target_len,
               int64_t crop_start) {
    FILE *f = fopen(path, "rb");
    if (!f) return WAVIO_ERR_OPEN;
    wav_info info;
    int rc = parse_header(f, &info);
    if (rc != WAVIO_OK) { fclose(f); return rc; }

    int ch = info.num_channels;
    int bytes_per = info.bits_per_sample / 8;
    if (ch < 1 || (bytes_per != 2 && bytes_per != 4)) {
        fclose(f);
        return WAVIO_ERR_UNSUPPORTED;
    }
    int64_t frames = info.data_bytes / (bytes_per * ch);

    if (crop_start < 0) crop_start = 0;
    if (crop_start > frames) crop_start = frames;
    int64_t avail = frames - crop_start;
    int64_t n = avail < target_len ? avail : target_len;

    fseek(f, info.data_offset + crop_start * bytes_per * ch, SEEK_SET);

    const int64_t BUF_FRAMES = 4096;
    uint8_t *buf = (uint8_t *)malloc((size_t)(BUF_FRAMES * bytes_per * ch));
    int64_t done = 0;
    int is_float = (info.audio_format == 3);
    while (done < n) {
        int64_t take = n - done < BUF_FRAMES ? n - done : BUF_FRAMES;
        size_t got = fread(buf, (size_t)(bytes_per * ch), (size_t)take, f);
        if (got == 0) break;
        for (size_t i = 0; i < got; i++) {
            float acc = 0.0f;
            for (int c = 0; c < ch; c++) {
                if (bytes_per == 2) {
                    int16_t v;
                    memcpy(&v, buf + (i * ch + c) * 2, 2);
                    acc += (float)v / 32768.0f;
                } else if (is_float) {
                    float v;
                    memcpy(&v, buf + (i * ch + c) * 4, 4);
                    acc += v;
                } else {
                    int32_t v;
                    memcpy(&v, buf + (i * ch + c) * 4, 4);
                    acc += (float)v / 2147483648.0f;
                }
            }
            out[done + (int64_t)i] = acc / (float)ch;
        }
        done += (int64_t)got;
    }
    free(buf);
    fclose(f);
    for (int64_t i = done; i < target_len; i++) out[i] = 0.0f;
    return (int)info.sample_rate;
}

/* Number of frames in the file (for random-crop bounds); <0 on error. */
int64_t wavio_num_frames(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) return WAVIO_ERR_OPEN;
    wav_info info;
    int rc = parse_header(f, &info);
    fclose(f);
    if (rc != WAVIO_OK) return rc;
    int bytes_per = info.bits_per_sample / 8;
    if (info.num_channels < 1 || bytes_per == 0) return WAVIO_ERR_UNSUPPORTED;
    return (int64_t)(info.data_bytes / (bytes_per * info.num_channels));
}

/* Batch decode: paths is a NUL-separated buffer of batch concatenated
 * paths; out is [batch, target_len]. crop_starts per item. Returns 0 or the
 * first error code. */
int wavio_load_batch(const char *paths, int64_t batch, float *out,
                     int64_t target_len, const int64_t *crop_starts) {
    const char *p = paths;
    for (int64_t b = 0; b < batch; b++) {
        int rc = wavio_load(p, out + b * target_len, target_len, crop_starts[b]);
        if (rc < 0) return rc;
        p += strlen(p) + 1;
    }
    return 0;
}
