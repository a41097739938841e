// Multi-part EXR fixture generator: writes one OpenEXR 2.0 multi-part file
// through the SYSTEM libOpenEXR (3.1) — a scanline ZIP/float part, a tiled
// PIZ/half part and a single-channel ZIPS/float part — then reads each part
// back through ImfMultiPartInputFile and dumps the decoded pixels as raw
// float32: ground truth for nefii_tpu/utils/exr.py's multi-part decode
// (tests/test_exr_fixtures.py). Build & run (dev-time only; the generated
// fixtures are committed):
//
//   g++ -O2 -std=c++17 -I/usr/include/OpenEXR -I/usr/include/Imath \
//       tests/gen_exr_multipart.cpp -lOpenEXR-3_1 -lImath-3_1 -lIex-3_1 \
//       -o /tmp/gen_exr_multipart
//   /tmp/gen_exr_multipart tests/fixtures/exr

#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImfInputPart.h>
#include <ImfMultiPartInputFile.h>
#include <ImfMultiPartOutputFile.h>
#include <ImfOutputPart.h>
#include <ImfPartType.h>
#include <ImfTileDescription.h>
#include <ImfTiledInputPart.h>
#include <ImfTiledOutputPart.h>
#include <half.h>

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

using namespace OPENEXR_IMF_NAMESPACE;
using IMATH_NAMESPACE::Box2i;
using IMATH_NAMESPACE::V2i;

static const int W = 73, H = 41;  // odd sizes: edge-clipped tiles

static float pattern(int part, int y, int x, int c) {
    uint32_t s = 1000003u * part + 73856093u * y + 19349663u * x + 83492791u * c;
    s = s * 1664525u + 1013904223u;
    float noise = (s >> 8) * (1.0f / 16777216.0f);
    if ((x / 8 + y / 8 + part) % 4 == 0) return 0.25f * c + 0.5f * part;
    if (y % 11 == part % 11) return 0.0f;
    return (float)x / W + (float)y / H * 0.5f + 0.1f * c + part + noise * 0.5f;
}

static void dump(const char* path, const std::vector<float>& px) {
    FILE* f = std::fopen(path, "wb");
    std::fwrite(px.data(), sizeof(float), px.size(), f);
    std::fclose(f);
}

int main(int argc, char** argv) {
    if (argc != 2) {
        std::fprintf(stderr, "usage: %s <out_dir>\n", argv[0]);
        return 1;
    }
    std::string dir = argv[1];
    std::string exr_path = dir + "/multipart.exr";
    Box2i dw(V2i(0, 0), V2i(W - 1, H - 1));

    std::vector<Header> headers;
    {
        Header h(W, H);
        h.setName("beauty");
        h.setType(SCANLINEIMAGE);
        h.compression() = ZIP_COMPRESSION;
        h.channels().insert("R", Channel(FLOAT));
        h.channels().insert("G", Channel(FLOAT));
        h.channels().insert("B", Channel(FLOAT));
        headers.push_back(h);
    }
    {
        Header h(W, H);
        h.setName("aux_tiled");
        h.setType(TILEDIMAGE);
        h.compression() = PIZ_COMPRESSION;
        h.setTileDescription(TileDescription(24, 16, ONE_LEVEL));
        h.channels().insert("R", Channel(HALF));
        h.channels().insert("G", Channel(HALF));
        h.channels().insert("B", Channel(HALF));
        headers.push_back(h);
    }
    {
        Header h(W, H);
        h.setName("depth");
        h.setType(SCANLINEIMAGE);
        h.compression() = ZIPS_COMPRESSION;
        h.channels().insert("Z", Channel(FLOAT));
        headers.push_back(h);
    }

    {  // scope: the output file must close before the read-back opens it
    MultiPartOutputFile out(exr_path.c_str(), headers.data(),
                            (int)headers.size());

    // part 0: scanline float RGB
    {
        std::vector<float> R(W * H), G(W * H), B(W * H);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) {
                R[y * W + x] = pattern(0, y, x, 0);
                G[y * W + x] = pattern(0, y, x, 1);
                B[y * W + x] = pattern(0, y, x, 2);
            }
        FrameBuffer fb;
        fb.insert("R", Slice(FLOAT, (char*)R.data(), 4, 4 * W));
        fb.insert("G", Slice(FLOAT, (char*)G.data(), 4, 4 * W));
        fb.insert("B", Slice(FLOAT, (char*)B.data(), 4, 4 * W));
        OutputPart p(out, 0);
        p.setFrameBuffer(fb);
        p.writePixels(H);
    }
    // part 1: tiled half RGB
    {
        std::vector<half> R(W * H), G(W * H), B(W * H);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) {
                R[y * W + x] = (half)pattern(1, y, x, 0);
                G[y * W + x] = (half)pattern(1, y, x, 1);
                B[y * W + x] = (half)pattern(1, y, x, 2);
            }
        FrameBuffer fb;
        fb.insert("R", Slice(HALF, (char*)R.data(), 2, 2 * W));
        fb.insert("G", Slice(HALF, (char*)G.data(), 2, 2 * W));
        fb.insert("B", Slice(HALF, (char*)B.data(), 2, 2 * W));
        TiledOutputPart p(out, 1);
        p.setFrameBuffer(fb);
        p.writeTiles(0, p.numXTiles() - 1, 0, p.numYTiles() - 1);
    }
    // part 2: scanline float Z
    {
        std::vector<float> Z(W * H);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) Z[y * W + x] = pattern(2, y, x, 0);
        FrameBuffer fb;
        fb.insert("Z", Slice(FLOAT, (char*)Z.data(), 4, 4 * W));
        OutputPart p(out, 2);
        p.setFrameBuffer(fb);
        p.writePixels(H);
    }
    }  // MultiPartOutputFile closes here

    // ---- read back through libOpenEXR and dump ground truth -------------
    MultiPartInputFile in(exr_path.c_str());
    {
        std::vector<float> R(W * H), G(W * H), B(W * H);
        FrameBuffer fb;
        fb.insert("R", Slice(FLOAT, (char*)R.data(), 4, 4 * W));
        fb.insert("G", Slice(FLOAT, (char*)G.data(), 4, 4 * W));
        fb.insert("B", Slice(FLOAT, (char*)B.data(), 4, 4 * W));
        InputPart p(in, 0);
        p.setFrameBuffer(fb);
        p.readPixels(0, H - 1);
        std::vector<float> px(W * H * 3);
        for (int i = 0; i < W * H; i++) {
            px[3 * i] = R[i]; px[3 * i + 1] = G[i]; px[3 * i + 2] = B[i];
        }
        dump((dir + "/multipart_part0.f32").c_str(), px);
    }
    {
        std::vector<half> R(W * H), G(W * H), B(W * H);
        FrameBuffer fb;
        fb.insert("R", Slice(HALF, (char*)R.data(), 2, 2 * W));
        fb.insert("G", Slice(HALF, (char*)G.data(), 2, 2 * W));
        fb.insert("B", Slice(HALF, (char*)B.data(), 2, 2 * W));
        TiledInputPart p(in, 1);
        p.setFrameBuffer(fb);
        p.readTiles(0, p.numXTiles() - 1, 0, p.numYTiles() - 1);
        std::vector<float> px(W * H * 3);
        for (int i = 0; i < W * H; i++) {
            px[3 * i] = R[i]; px[3 * i + 1] = G[i]; px[3 * i + 2] = B[i];
        }
        dump((dir + "/multipart_part1.f32").c_str(), px);
    }
    {
        std::vector<float> Z(W * H);
        FrameBuffer fb;
        fb.insert("Z", Slice(FLOAT, (char*)Z.data(), 4, 4 * W));
        InputPart p(in, 2);
        p.setFrameBuffer(fb);
        p.readPixels(0, H - 1);
        dump((dir + "/multipart_part2.f32").c_str(), Z);
    }
    std::printf("wrote %s + 3 ground-truth dumps\n", exr_path.c_str());
    return 0;
}
