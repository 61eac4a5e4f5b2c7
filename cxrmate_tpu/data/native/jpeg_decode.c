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
