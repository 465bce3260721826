// hevcparse — validate rabbit's HEVC IPCM subset writer against the
// reference's HEVC NAL parser (dependencies/PccLibHevcParser, the library
// TMC2 uses to probe HEVC sub-streams).  Reads an Annex-B file, runs
// PccHevcParser::getVideoSize (full SPS parse via TDecCavlc) and dumps
// width/height/bitdepth + NAL/frame inventory as key=value lines.
//
// Original glue; reference code linked, never copied
// (PccHevcParser.h:45-71).
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "PccHevcParser.h"

#include <string>

// The parser library's debug helpers declare these without defining them
// (dead code on this path); satisfy the linker with stubs.
namespace pcc_hevc {
std::string splitOnSettings( const std::string& s ) { return s; }
std::string lineWrap( const std::string& s, const unsigned int ) { return s; }
std::string indentNewLines( const std::string& s, const unsigned int ) {
  return s;
}
}  // namespace pcc_hevc

int main( int argc, char* argv[] ) {
  if ( argc != 2 ) {
    fprintf( stderr, "usage: hevcparse <stream.265>\n" );
    return 2;
  }
  FILE* f = fopen( argv[1], "rb" );
  if ( !f ) return 1;
  fseek( f, 0, SEEK_END );
  long size = ftell( f );
  fseek( f, 0, SEEK_SET );
  std::vector<uint8_t> buf( size );
  if ( fread( buf.data(), 1, size, f ) != (size_t)size ) return 1;
  fclose( f );

  pcc_hevc::PccHevcParser parser;
  size_t width = 0, height = 0, bitDepth = 0;
  bool   is444 = false;
  parser.getVideoSize( buf, width, height, bitDepth, is444 );
  printf( "width=%zu\n", width );
  printf( "height=%zu\n", height );
  printf( "bitdepth=%zu\n", bitDepth );
  printf( "is444=%d\n", (int)is444 );
  // getVideoSize does not populate the parser's NAL vectors (reference
  // behavior, PccHevcParser.cpp:151-198) — inventory NALs with the same
  // start-code walk the reference uses so the gate can assert counts.
  size_t nVps = 0, nSps = 0, nPps = 0, nSlice = 0, nOther = 0;
  for ( long i = 0; i + 4 <= size; i++ ) {
    bool sc4 = buf[i] == 0 && buf[i + 1] == 0 && buf[i + 2] == 0 && buf[i + 3] == 1;
    bool sc3 = buf[i] == 0 && buf[i + 1] == 0 && buf[i + 2] == 1;
    if ( !sc4 && !sc3 ) continue;
    long hdr = i + ( sc4 ? 4 : 3 );
    if ( hdr >= size ) break;
    int t = ( buf[hdr] & 126 ) >> 1;
    if ( t == 32 ) nVps++;
    else if ( t == 33 ) nSps++;
    else if ( t == 34 ) nPps++;
    else if ( t < 32 ) nSlice++;
    else nOther++;
    i = hdr;
  }
  printf( "vps_count=%zu\n", nVps );
  printf( "sps_count=%zu\n", nSps );
  printf( "pps_count=%zu\n", nPps );
  printf( "slice_count=%zu\n", nSlice );
  return 0;
}
