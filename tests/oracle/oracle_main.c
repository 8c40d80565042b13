/* Parity-oracle driver for the reference SIFT3D library.
 *
 * This is test harness code owned by this repository. It links against the
 * reference library (compiled separately from /root/reference, never copied
 * here) and exposes its results as raw binary files so the TPU implementation
 * can be compared stage by stage.
 *
 * Usage:
 *   oracle VOL.raw NX NY NZ UX UY UZ OUTDIR [peak corner kp_levels sigma_n sigma0]
 *
 * VOL.raw: float32, x-fastest (column-major), nx*ny*nz elements.
 * Writes into OUTDIR:
 *   keys.bin  : int64 n, then n records of double[16]:
 *               strength x y z o s sd R00 R01 R02 R10 R11 R12 R20 R21 R22
 *   desc.bin  : int64 n, then n records of float[772]: x y z sd el0..el767
 *   gpyr_o<o>_l<i>.bin / dog_o<o>_l<i>.bin : raw float32 levels (x-fastest),
 *               i is the stacked level index (raw level s = i - 1).
 *   keys.csv / desc.csv: the library's own CSV output format.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <sift.h>
#include <imutil.h>
/* Private headers from the reference tree: used read-only to reach
 * intermediates (pyramid levels, keypoint records) that the public API does
 * not expose. */
#include "imtypes_private.h"
#include "immacros.h"

static void die(const char *msg) {
    fprintf(stderr, "oracle: %s\n", msg);
    exit(1);
}

static void write_raw(const char *dir, const char *name, const void *data,
                      size_t bytes) {
    char path[4096];
    snprintf(path, sizeof(path), "%s/%s", dir, name);
    FILE *f = fopen(path, "wb");
    if (!f) die("cannot open output file");
    if (fwrite(data, 1, bytes, f) != bytes) die("short write");
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc < 9) die("usage: oracle VOL.raw NX NY NZ UX UY UZ OUTDIR "
                      "[peak corner kp_levels sigma_n sigma0]");
    const char *vol_path = argv[1];
    const int nx = atoi(argv[2]), ny = atoi(argv[3]), nz = atoi(argv[4]);
    const double ux = atof(argv[5]), uy = atof(argv[6]), uz = atof(argv[7]);
    const char *outdir = argv[8];

    sift3d_detector *det = sift3d_make_detector();
    if (!det) die("detector init failed");
    if (argc > 9 && sift3d_detector_set_peak_thresh(det, atof(argv[9])))
        die("bad peak_thresh");
    if (argc > 10 && sift3d_detector_set_corner_thresh(det, atof(argv[10])))
        die("bad corner_thresh");
    if (argc > 11 && sift3d_detector_set_num_kp_levels(det, atoi(argv[11])))
        die("bad num_kp_levels");
    if (argc > 12 && sift3d_detector_set_sigma_n(det, atof(argv[12])))
        die("bad sigma_n");
    if (argc > 13 && sift3d_detector_set_sigma0(det, atof(argv[13])))
        die("bad sigma0");

    /* Load the raw volume. */
    sift3d_image *im = sift3d_make_image(nx, ny, nz, 1);
    if (!im) die("image alloc failed");
    {
        FILE *f = fopen(vol_path, "rb");
        if (!f) die("cannot open volume");
        size_t n = (size_t)nx * ny * nz;
        if (fread(sift3d_image_data(im), sizeof(float), n, f) != n)
            die("short volume read");
        fclose(f);
    }
    im->ux = ux; im->uy = uy; im->uz = uz;

    sift3d_keypoint_store *kp = sift3d_make_keypoint_store();
    sift3d_descriptor_store *ds = sift3d_make_descriptor_store();

    if (sift3d_detect_keypoints(det, im, kp)) die("detect failed");

    /* Dump pyramids. */
    {
        const sift3d_pyramid *pyrs[2] = {&det->gpyr, &det->dog};
        const char *names[2] = {"gpyr", "dog"};
        for (int p = 0; p < 2; p++) {
            const sift3d_pyramid *pyr = pyrs[p];
            int o, s;
            for (o = pyr->first_octave;
                 o <= pyr->first_octave + pyr->num_octaves - 1; o++) {
                for (s = pyr->first_level;
                     s <= pyr->first_level + pyr->num_levels - 1; s++) {
                    const sift3d_image *lvl = SIFT3D_PYR_IM_GET(pyr, o, s);
                    char name[128];
                    snprintf(name, sizeof(name), "%s_o%d_l%d.bin", names[p],
                             o, s - pyr->first_level);
                    write_raw(outdir, name, lvl->data,
                              lvl->size * sizeof(float));
                }
            }
        }
    }

    /* Dump keypoints (raw, full precision). */
    {
        long long n = (long long)kp->slab.num;
        double *buf = malloc(n * 16 * sizeof(double));
        for (long long i = 0; i < n; i++) {
            const sift3d_keypoint *k = kp->buf + i;
            double *r = buf + i * 16;
            r[0] = k->strength;
            r[1] = k->xd; r[2] = k->yd; r[3] = k->zd;
            r[4] = k->o;  r[5] = k->s;  r[6] = k->sd;
            for (int j = 0; j < 9; j++) r[7 + j] = k->r_data[j];
        }
        char path[4096];
        snprintf(path, sizeof(path), "%s/keys.bin", outdir);
        FILE *f = fopen(path, "wb");
        if (!f) die("cannot open keys.bin");
        fwrite(&n, sizeof(n), 1, f);
        fwrite(buf, sizeof(double), n * 16, f);
        fclose(f);
        free(buf);
    }

    /* Library CSV formats, for format-parity tests. */
    {
        char path[4096];
        snprintf(path, sizeof(path), "%s/keys.csv", outdir);
        if (sift3d_keypoint_store_save(path, kp)) die("keys.csv failed");
    }

    if (kp->slab.num > 0) {
        if (sift3d_extract_descriptors(det, kp, ds)) die("extract failed");

        long long n = (long long)ds->num;
        float *buf = malloc(n * 772 * sizeof(float));
        for (long long i = 0; i < n; i++) {
            const sift3d_descriptor *d = ds->buf + i;
            float *r = buf + i * 772;
            r[0] = (float)d->xd; r[1] = (float)d->yd; r[2] = (float)d->zd;
            r[3] = (float)d->sd;
            for (int h = 0; h < DESC_NUM_TOTAL_HIST; h++)
                for (int b = 0; b < HIST_NUMEL; b++)
                    r[4 + h * HIST_NUMEL + b] = d->hists[h].bins[b];
        }
        char path[4096];
        snprintf(path, sizeof(path), "%s/desc.bin", outdir);
        FILE *f = fopen(path, "wb");
        if (!f) die("cannot open desc.bin");
        fwrite(&n, sizeof(n), 1, f);
        fwrite(buf, sizeof(float), n * 772, f);
        fclose(f);
        free(buf);

        snprintf(path, sizeof(path), "%s/desc.csv", outdir);
        if (sift3d_descriptor_store_save(path, ds)) die("desc.csv failed");
    }

    sift3d_free_descriptor_store(ds);
    sift3d_free_keypoint_store(kp);
    sift3d_free_image(im);
    sift3d_free_detector(det);
    return 0;
}
