/* Native host-side image ops for the video pipelines.
 *
 * The per-frame host path (decode -> preprocess -> resize) runs for every
 * frame of every pass in vid_img/clip_video_style; at 1920px a dense-matrix
 * numpy resize costs tens of GFLOP per frame.  This C implementation does
 * the 2-tap separable bilinear directly (exact torch
 * F.interpolate(align_corners=False) semantics, including the scale_factor
 * coordinate quirk) with a row-partitioned thread pool.
 *
 * Exposed as a plain C ABI consumed via ctypes (no Python.h dependency):
 *   resize_bilinear_f32(src, h, w, c, dst, oh, ow, inv_scale_h, inv_scale_w, n_threads)
 *   caffe_preprocess_u8(rgb_u8, n, out_f32)   RGB u8 -> BGR mean-subtracted f32
 *   caffe_deprocess_f32(bgr_f32, n, out_u8)   inverse, clamped
 *   chi2_distance_matrix(hists, n, d, out)    similarity driver distances
 */

#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const float *src;
    float *dst;
    int h, w, c, oh, ow;
    double inv_h, inv_w;
    int row_start, row_end;
    const int *x0;
    const int *x1;
    const float *tx;
} resize_job;

static void *resize_rows(void *arg) {
    resize_job *j = (resize_job *)arg;
    const int w = j->w, c = j->c, ow = j->ow, h = j->h;
    for (int oy = j->row_start; oy < j->row_end; oy++) {
        double sy = (oy + 0.5) * j->inv_h - 0.5;
        if (sy < 0) sy = 0;
        if (sy > h - 1) sy = h - 1;
        int y0 = (int)floor(sy);
        int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
        float ty = (float)(sy - y0);
        const float *row0 = j->src + (size_t)y0 * w * c;
        const float *row1 = j->src + (size_t)y1 * w * c;
        float *out = j->dst + (size_t)oy * ow * c;
        for (int ox = 0; ox < ow; ox++) {
            int px0 = j->x0[ox], px1 = j->x1[ox];
            float tx = j->tx[ox];
            const float *a0 = row0 + (size_t)px0 * c;
            const float *a1 = row0 + (size_t)px1 * c;
            const float *b0 = row1 + (size_t)px0 * c;
            const float *b1 = row1 + (size_t)px1 * c;
            for (int k = 0; k < c; k++) {
                float top = a0[k] + tx * (a1[k] - a0[k]);
                float bot = b0[k] + tx * (b1[k] - b0[k]);
                out[ox * c + k] = top + ty * (bot - top);
            }
        }
    }
    return NULL;
}

void resize_bilinear_f32(const float *src, int h, int w, int c, float *dst, int oh, int ow,
                         double inv_scale_h, double inv_scale_w, int n_threads) {
    if (inv_scale_h <= 0) inv_scale_h = (double)h / oh;
    if (inv_scale_w <= 0) inv_scale_w = (double)w / ow;

    int *x0 = (int *)malloc(sizeof(int) * ow);
    int *x1 = (int *)malloc(sizeof(int) * ow);
    float *tx = (float *)malloc(sizeof(float) * ow);
    for (int ox = 0; ox < ow; ox++) {
        double sx = (ox + 0.5) * inv_scale_w - 0.5;
        if (sx < 0) sx = 0;
        if (sx > w - 1) sx = w - 1;
        x0[ox] = (int)floor(sx);
        x1[ox] = x0[ox] + 1 < w ? x0[ox] + 1 : w - 1;
        tx[ox] = (float)(sx - x0[ox]);
    }

    if (n_threads < 1) n_threads = 1;
    if (n_threads > oh) n_threads = oh;
    pthread_t threads[64];
    resize_job jobs[64];
    if (n_threads > 64) n_threads = 64;
    int rows_per = (oh + n_threads - 1) / n_threads;
    int nt = 0;
    for (int t = 0; t < n_threads; t++) {
        int start = t * rows_per;
        int end = start + rows_per < oh ? start + rows_per : oh;
        if (start >= end) break;
        jobs[t] = (resize_job){src, dst, h, w, c, oh, ow, inv_scale_h, inv_scale_w, start, end, x0, x1, tx};
        pthread_create(&threads[t], NULL, resize_rows, &jobs[t]);
        nt++;
    }
    for (int t = 0; t < nt; t++) pthread_join(threads[t], NULL);
    free(x0);
    free(x1);
    free(tx);
}

static const float CAFFE_MEAN[3] = {103.939f, 116.779f, 123.68f}; /* B, G, R */

void caffe_preprocess_u8(const uint8_t *rgb, int64_t n_pixels, float *out) {
    for (int64_t i = 0; i < n_pixels; i++) {
        const uint8_t *p = rgb + i * 3;
        float *o = out + i * 3;
        o[0] = (float)p[2] - CAFFE_MEAN[0];
        o[1] = (float)p[1] - CAFFE_MEAN[1];
        o[2] = (float)p[0] - CAFFE_MEAN[2];
    }
}

void caffe_deprocess_f32(const float *bgr, int64_t n_pixels, uint8_t *out) {
    for (int64_t i = 0; i < n_pixels; i++) {
        const float *p = bgr + i * 3;
        uint8_t *o = out + i * 3;
        float r = p[2] + CAFFE_MEAN[2];
        float g = p[1] + CAFFE_MEAN[1];
        float b = p[0] + CAFFE_MEAN[0];
        o[0] = r < 0 ? 0 : (r > 255 ? 255 : (uint8_t)(r + 0.5f));
        o[1] = g < 0 ? 0 : (g > 255 ? 255 : (uint8_t)(g + 0.5f));
        o[2] = b < 0 ? 0 : (b > 255 ? 255 : (uint8_t)(b + 0.5f));
    }
}

void chi2_distance_matrix(const double *hists, int n, int d, double *out) {
    for (int i = 0; i < n; i++) {
        for (int j = 0; j < n; j++) {
            const double *a = hists + (size_t)i * d;
            const double *b = hists + (size_t)j * d;
            double acc = 0.0;
            int same = 1;
            for (int k = 0; k < d; k++) {
                double diff = a[k] - b[k];
                acc += diff * diff / (a[k] + b[k] + 1e-10);
                if (a[k] != b[k]) same = 0;
            }
            out[(size_t)i * n + j] = same ? INFINITY : 0.5 * acc;
        }
    }
}
