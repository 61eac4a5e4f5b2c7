/* libjpeg decode shim for the training data loader.
 *
 * Replaces PIL's decode on the training path (the reference decodes every JPEG
 * with PIL, /root/reference/data/dicom_id.py:91-94). Two entry points:
 *
 *   jpeg_dims(buf, len, denom, &w, &h)  -> output dimensions at scale 1/denom
 *   jpeg_decode_rgb(buf, len, denom, out) -> RGB8 rows into caller's buffer
 *
 * scale_denom in {1, 2, 4, 8} uses libjpeg's DCT-domain scaling: a 2500x3000
 * MIMIC image headed for a 384px shortest edge decodes at 1/4 scale with ~16x
 * less IDCT + resize work. Grayscale sources are expanded to RGB by libjpeg
 * (same replication PIL's convert("RGB") performs). Returns 0 on success,
 * nonzero on any libjpeg error (caller falls back to PIL).
 */
#include <setjmp.h>
#include <stddef.h>
#include <stdio.h>
#include <string.h>

#include <jpeglib.h>

typedef struct {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
} err_mgr;

static void on_error(j_common_ptr cinfo) {
    err_mgr *e = (err_mgr *)cinfo->err;
    longjmp(e->jb, 1);
}

static int setup(struct jpeg_decompress_struct *cinfo, err_mgr *err,
                 const unsigned char *buf, unsigned long len, int denom) {
    cinfo->err = jpeg_std_error(&err->pub);
    err->pub.error_exit = on_error;
    jpeg_create_decompress(cinfo);
    jpeg_mem_src(cinfo, (unsigned char *)buf, len);
    if (jpeg_read_header(cinfo, TRUE) != JPEG_HEADER_OK) return 1;
    cinfo->scale_num = 1;
    cinfo->scale_denom = (unsigned int)denom;
    cinfo->out_color_space = JCS_RGB;
    cinfo->dct_method = JDCT_ISLOW; /* PIL's default */
    return 0;
}

int jpeg_dims(const unsigned char *buf, unsigned long len, int denom,
              int *width, int *height) {
    struct jpeg_decompress_struct cinfo;
    err_mgr err;
    if (setjmp(err.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    if (setup(&cinfo, &err, buf, len, denom)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_calc_output_dimensions(&cinfo);
    *width = (int)cinfo.output_width;
    *height = (int)cinfo.output_height;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int jpeg_decode_rgb(const unsigned char *buf, unsigned long len, int denom,
                    unsigned char *out) {
    struct jpeg_decompress_struct cinfo;
    err_mgr err;
    if (setjmp(err.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    if (setup(&cinfo, &err, buf, len, denom)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_start_decompress(&cinfo);
    if (cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    size_t stride = (size_t)cinfo.output_width * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char *row = out + (size_t)cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* --- throughput-serving loader path (bench/input-pipeline, round 4) ---------
 *
 * The PIL-exact eval loader decodes the FULL ~2500x3000 MIMIC image and
 * resizes it in PIL: ~200 ms/image on this 1-core host, while the chip asks
 * for ~95 images/s at greedy batch 96 (DEVNOTES "input pipeline"). The fast
 * path below keeps the whole host step in one C call:
 *   - DCT-domain scaled decode (denom picked by the caller, shortest edge
 *     stays >= target);
 *   - grayscale output for grayscale sources (MIMIC JPEGs are 1-channel):
 *     1/3 the color-convert + row traffic of the JCS_RGB expansion, and the
 *     replication to 3 channels is deferred to the device;
 *   - optional JDCT_IFAST (train path only: bounded numeric change on top of
 *     an already DCT-scaled decode);
 *   - separable bilinear resize (align-corners=false, the torchvision/PIL
 *     convention) straight from the decode buffer to the target size, fixed
 *     16.16 row weights, u8 output. NOT bit-identical to PIL's resample
 *     (PIL uses 8-bit precomputed coefficient tables) — serving/training
 *     path only; golden-CSV parity keeps the PIL loader.
 */

static void resize_bilinear_u8(const unsigned char *in, int ih, int iw,
                               unsigned char *out, int oh, int ow,
                               float *rowbuf /* 2*ow floats scratch */) {
    /* separable: horizontal lerp into two cached float rows, vertical lerp out */
    float sy = (float)ih / (float)oh, sx = (float)iw / (float)ow;
    int cached_y0 = -1, cached_y1 = -1;
    float *r0 = rowbuf, *r1 = rowbuf + ow;
    for (int oy = 0; oy < oh; oy++) {
        float fy = ((float)oy + 0.5f) * sy - 0.5f;
        int y0 = (int)fy - (fy < 0.0f && fy != (float)(int)fy ? 1 : 0); /* floor */
        float wy = fy - (float)y0;
        int y1 = y0 + 1;
        if (y0 < 0) y0 = 0;
        if (y1 < 0) y1 = 0;
        if (y0 > ih - 1) y0 = ih - 1;
        if (y1 > ih - 1) y1 = ih - 1;
        /* horizontal pass for the two source rows (reuse when strided) */
        for (int pass = 0; pass < 2; pass++) {
            int sy_row = pass ? y1 : y0;
            float *dst = pass ? r1 : r0;
            int *cached = pass ? &cached_y1 : &cached_y0;
            if (*cached == sy_row) continue;
            /* row y1 of the previous step is often row y0 of this one */
            if (!pass && cached_y1 == sy_row) {
                float *t = r0; r0 = r1; r1 = t;
                int c = cached_y0; cached_y0 = cached_y1; cached_y1 = c;
                dst = r0; /* swapped */
                if (cached_y0 == sy_row) continue;
            }
            const unsigned char *src = in + (size_t)sy_row * iw;
            for (int ox = 0; ox < ow; ox++) {
                float fx = ((float)ox + 0.5f) * sx - 0.5f;
                int x0 = (int)fx - (fx < 0.0f && fx != (float)(int)fx ? 1 : 0);
                float wx = fx - (float)x0;
                int x1 = x0 + 1;
                if (x0 < 0) x0 = 0;
                if (x1 < 0) x1 = 0;
                if (x0 > iw - 1) x0 = iw - 1;
                if (x1 > iw - 1) x1 = iw - 1;
                dst[ox] = (1.0f - wx) * (float)src[x0] + wx * (float)src[x1];
            }
            *cached = sy_row;
        }
        unsigned char *orow = out + (size_t)oy * ow;
        for (int ox = 0; ox < ow; ox++) {
            float v = (1.0f - wy) * r0[ox] + wy * r1[ox];
            int iv = (int)(v + 0.5f);
            orow[ox] = (unsigned char)(iv < 0 ? 0 : (iv > 255 ? 255 : iv));
        }
    }
}

/* Decode (optionally grayscale / fast-DCT) at 1/denom and bilinear-resize to
 * exactly (out_h, out_w). Caller computes the output dims (torchvision
 * shortest-edge rule) from jpeg_dims. Grayscale output needs the source to be
 * single-component (returns 3 otherwise, caller falls back); gray=0 decodes
 * RGB and resizes each channel. ``work`` is caller scratch of
 * decode_h*decode_w*components + 2*out_w*4 bytes. */
int jpeg_decode_resized(const unsigned char *buf, unsigned long len, int denom,
                        int gray, int fast_dct, int out_h, int out_w,
                        unsigned char *out, unsigned char *work) {
    struct jpeg_decompress_struct cinfo;
    err_mgr err;
    if (setjmp(err.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    if (setup(&cinfo, &err, buf, len, denom)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    if (gray) {
        if (cinfo.num_components != 1) {
            jpeg_destroy_decompress(&cinfo);
            return 3; /* colour source: caller uses the RGB path */
        }
        cinfo.out_color_space = JCS_GRAYSCALE;
    }
    if (fast_dct) cinfo.dct_method = JDCT_IFAST;
    jpeg_start_decompress(&cinfo);
    int comps = cinfo.output_components;
    if (comps != (gray ? 1 : 3)) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    int ih = (int)cinfo.output_height, iw = (int)cinfo.output_width;
    size_t stride = (size_t)iw * comps;
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char *row = work + (size_t)cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    /* keep the float scratch 64-byte aligned relative to the (numpy-aligned)
     * work base */
    size_t rb_off = (((size_t)ih * stride) + 63u) & ~(size_t)63u;
    float *rowbuf = (float *)(work + rb_off);
    if (comps == 1) {
        resize_bilinear_u8(work, ih, iw, out, out_h, out_w, rowbuf);
    } else {
        /* planar-ise each channel through the same kernel (decode buffer is
         * interleaved; build a per-channel copy in the tail of work) */
        unsigned char *plane = (unsigned char *)(rowbuf + 2 * out_w);
        unsigned char *oplane = plane + (size_t)ih * iw;
        for (int c = 0; c < 3; c++) {
            const unsigned char *src = work + c;
            for (size_t i = 0; i < (size_t)ih * iw; i++) plane[i] = src[i * 3];
            resize_bilinear_u8(plane, ih, iw, oplane, out_h, out_w, rowbuf);
            unsigned char *dst = out + c;
            for (size_t i = 0; i < (size_t)out_h * out_w; i++) dst[i * 3] = oplane[i];
        }
    }
    return 0;
}
