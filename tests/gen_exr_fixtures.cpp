// EXR fixture generator: writes small deterministic images through the
// SYSTEM libOpenEXR (3.1) at every scanline compression the format defines,
// then reads each file back through libOpenEXR and dumps the decoded pixels
// as raw float32 — ground truth for nefii_tpu/utils/exr.py's from-scratch
// decoder (tests/test_exr_fixtures.py). Build & run (dev-time only; the
// generated fixtures are committed):
//
//   g++ -O2 -std=c++17 -I/usr/include/OpenEXR -I/usr/include/Imath \
//       tests/gen_exr_fixtures.cpp -lOpenEXR-3_1 -lImath-3_1 -lIex-3_1 \
//       -o /tmp/gen_exr_fixtures
//   /tmp/gen_exr_fixtures tests/fixtures/exr
//
// Pixel pattern: a deterministic LCG + gradients + flat patches (flat 4x4
// blocks exercise B44A's 3-byte blocks; runs exercise RLE), with negative
// values and exact zeros mixed in.

#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImfInputFile.h>
#include <ImfOutputFile.h>
#include <ImfTileDescription.h>
#include <ImfTiledOutputFile.h>
#include <half.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

using namespace OPENEXR_IMF_NAMESPACE;
using IMATH_NAMESPACE::Box2i;
using IMATH_NAMESPACE::V2i;

static uint32_t lcg_state = 12345;
static float lcg() {
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return (lcg_state >> 8) * (1.0f / 16777216.0f);
}

// deterministic test image, mirrored in tests/test_exr_fixtures.py
static float pattern(int y, int x, int c, int W, int H) {
    if ((x / 8 + y / 8) % 4 == 0) {              // flat patches
        return 0.25f * c;
    }
    if (y % 11 == 0) return 0.0f;                 // zero runs
    float g = (float)x / W + (float)y / H * 0.5f + 0.1f * c;
    float n = lcg() * 0.5f - 0.1f;                // includes negatives
    return g + n;
}

struct Spec {
    const char* name;
    Compression comp;
};

int main(int argc, char** argv) {
    if (argc != 2) {
        std::fprintf(stderr, "usage: %s <out_dir>\n", argv[0]);
        return 1;
    }
    std::string dir = argv[1];
    const int W = 67, H = 45;  // not multiples of 4/8/16/32: edge blocks

    Spec specs[] = {
        {"none", NO_COMPRESSION}, {"rle", RLE_COMPRESSION},
        {"zips", ZIPS_COMPRESSION}, {"zip", ZIP_COMPRESSION},
        {"piz", PIZ_COMPRESSION}, {"pxr24", PXR24_COMPRESSION},
        {"b44", B44_COMPRESSION}, {"b44a", B44A_COMPRESSION},
        {"dwaa", DWAA_COMPRESSION}, {"dwab", DWAB_COMPRESSION},
    };

    for (int use_float = 0; use_float <= 1; ++use_float)
        for (const Spec& s : specs)
            for (int with_alpha = 0; with_alpha <= 1; ++with_alpha) {
                if (with_alpha && use_float) continue;  // keep the set small
                int C = with_alpha ? 4 : 3;
                const char* chan[4] = {"R", "G", "B", "A"};
                lcg_state = 12345;  // same pixels for every variant

                std::vector<float> fimg((size_t)H * W * C);
                for (int y = 0; y < H; ++y)
                    for (int x = 0; x < W; ++x)
                        for (int c = 0; c < C; ++c)
                            fimg[((size_t)y * W + x) * C + c] =
                                (c == 3) ? ((x / 16) % 2 ? 1.0f : 0.5f)
                                         : pattern(y, x, c, W, H);

                std::vector<half> himg(fimg.size());
                for (size_t i = 0; i < fimg.size(); ++i) himg[i] = (half)fimg[i];

                std::string base = dir + "/" + s.name +
                                   (use_float ? "_f32" : "_f16") +
                                   (with_alpha ? "_rgba" : "_rgb");
                std::string exr_path = base + ".exr";

                Header hdr(W, H);
                hdr.compression() = s.comp;
                FrameBuffer fb;
                for (int c = 0; c < C; ++c) {
                    if (use_float) {
                        hdr.channels().insert(chan[c], Channel(FLOAT));
                        fb.insert(chan[c],
                                  Slice(FLOAT, (char*)(fimg.data() + c),
                                        sizeof(float) * C, sizeof(float) * C * W));
                    } else {
                        hdr.channels().insert(chan[c], Channel(HALF));
                        fb.insert(chan[c],
                                  Slice(HALF, (char*)(himg.data() + c),
                                        sizeof(half) * C, sizeof(half) * C * W));
                    }
                }
                {
                    OutputFile out(exr_path.c_str(), hdr);
                    out.setFrameBuffer(fb);
                    out.writePixels(H);
                }

                // read back through libOpenEXR -> ground truth float32
                std::vector<float> back((size_t)H * W * C);
                std::vector<half> hback((size_t)H * W * C);
                {
                    InputFile in(exr_path.c_str());
                    FrameBuffer rfb;
                    for (int c = 0; c < C; ++c) {
                        if (use_float)
                            rfb.insert(chan[c],
                                       Slice(FLOAT, (char*)(back.data() + c),
                                             sizeof(float) * C, sizeof(float) * C * W));
                        else
                            rfb.insert(chan[c],
                                       Slice(HALF, (char*)(hback.data() + c),
                                             sizeof(half) * C, sizeof(half) * C * W));
                    }
                    in.setFrameBuffer(rfb);
                    in.readPixels(0, H - 1);
                }
                if (!use_float)
                    for (size_t i = 0; i < back.size(); ++i) back[i] = (float)hback[i];

                std::string gt_path = base + ".f32";
                FILE* f = std::fopen(gt_path.c_str(), "wb");
                std::fwrite(back.data(), sizeof(float), back.size(), f);
                std::fclose(f);
                std::printf("wrote %s (+.f32 ground truth, %dx%dx%d)\n",
                            exr_path.c_str(), H, W, C);
            }

    // ----- tiled fixtures (f16 RGB): tile 24x20 against the 67x45 image ->
    // 3x3 tile grid with 19-wide / 5-high edge tiles (exercises B44/DWA
    // padding inside edge TILES, not just edge scanline blocks). ONE_LEVEL
    // for a codec spread, plus one MIPMAP_LEVELS and one RIPMAP_LEVELS file
    // (all levels written; ground truth = libOpenEXR's level-0 scanline
    // read, which is all the numpy codec exposes for tiled files).
    Spec tile_specs[] = {
        {"none", NO_COMPRESSION}, {"zip", ZIP_COMPRESSION},
        {"piz", PIZ_COMPRESSION}, {"b44", B44_COMPRESSION},
        {"dwaa", DWAA_COMPRESSION},
    };
    LevelMode modes[] = {ONE_LEVEL, MIPMAP_LEVELS, RIPMAP_LEVELS};
    const char* mode_tag[] = {"", "_mip", "_rip"};
    const int TX = 24, TY = 20;
    const char* chan[3] = {"R", "G", "B"};
    for (int mi = 0; mi < 3; ++mi)
        for (const Spec& s : tile_specs) {
            if (mi > 0 && s.comp != ZIP_COMPRESSION) continue;  // keep small
            std::string base = dir + "/tiled" + mode_tag[mi] + "_" + s.name +
                               "_f16_rgb";
            std::string exr_path = base + ".exr";

            Header hdr(W, H);
            hdr.compression() = s.comp;
            hdr.setTileDescription(
                TileDescription(TX, TY, modes[mi], ROUND_DOWN));
            for (int c = 0; c < 3; ++c)
                hdr.channels().insert(chan[c], Channel(HALF));
            {
                TiledOutputFile out(exr_path.c_str(), hdr);
                for (int ly = 0; ly < out.numYLevels(); ++ly)
                    for (int lx = 0; lx < out.numXLevels(); ++lx) {
                        if (modes[mi] == MIPMAP_LEVELS && lx != ly) continue;
                        int lw = out.levelWidth(lx), lh = out.levelHeight(ly);
                        lcg_state = 777 + 13 * (lx + 7 * ly);
                        std::vector<half> img((size_t)lh * lw * 3);
                        for (int y = 0; y < lh; ++y)
                            for (int x = 0; x < lw; ++x)
                                for (int c = 0; c < 3; ++c)
                                    img[((size_t)y * lw + x) * 3 + c] =
                                        (half)pattern(y, x, c, lw, lh);
                        FrameBuffer fb;
                        for (int c = 0; c < 3; ++c)
                            fb.insert(chan[c],
                                      Slice(HALF, (char*)(img.data() + c),
                                            sizeof(half) * 3,
                                            sizeof(half) * 3 * lw));
                        out.setFrameBuffer(fb);
                        out.writeTiles(0, out.numXTiles(lx) - 1,
                                       0, out.numYTiles(ly) - 1, lx, ly);
                    }
            }

            // ground truth: the SCANLINE-API read of the tiled file
            // (level 0), matching what exr.read must produce
            std::vector<half> hback((size_t)H * W * 3);
            {
                InputFile in(exr_path.c_str());
                FrameBuffer rfb;
                for (int c = 0; c < 3; ++c)
                    rfb.insert(chan[c],
                               Slice(HALF, (char*)(hback.data() + c),
                                     sizeof(half) * 3, sizeof(half) * 3 * W));
                in.setFrameBuffer(rfb);
                in.readPixels(0, H - 1);
            }
            std::vector<float> back(hback.size());
            for (size_t i = 0; i < back.size(); ++i) back[i] = (float)hback[i];
            FILE* f = std::fopen((base + ".f32").c_str(), "wb");
            std::fwrite(back.data(), sizeof(float), back.size(), f);
            std::fclose(f);
            std::printf("wrote %s (+.f32 ground truth, tiled %dx%d mode %d)\n",
                        exr_path.c_str(), TX, TY, (int)modes[mi]);
        }
    return 0;
}
