import java.io.File;
import java.io.FileOutputStream;
import java.io.IOException;
import java.io.OutputStream;
import java.net.URI;
import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FileUtil;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.permission.FsPermission;
import org.apache.hadoop.util.Progressable;

/**
 * Test fixture: MockFileSystem with OBJECT-STORE (S3) semantics, scheme
 * "mocks3".  Emulates the two properties that break HDFS-style commit
 * protocols on S3 and that the engine's snapshot commit must survive
 * (snapshots.py module docstring):
 *
 *  - rename() is COPY + DELETE: it silently OVERWRITES an existing
 *    destination and is not atomic -- an exists()-then-rename claim has
 *    a lost-update window on this store.
 *  - create(path, overwrite=false) is a CONDITIONAL PUT: the object
 *    appears (and the exists-check happens) atomically at CLOSE time,
 *    like S3's If-None-Match PUT -- a racing second writer gets
 *    FileAlreadyExistsException from close(), never a partial or
 *    clobbered object.
 *
 * There are no hard links on an object store; the engine's file://
 * createLink claim is unreachable here (scheme != "file").
 */
public class MockS3FileSystem extends MockFileSystem {
    @Override
    public URI getUri() {
        return URI.create("mocks3:///");
    }

    @Override
    public String getScheme() {
        return "mocks3";
    }

    @Override
    public boolean rename(Path src, Path dst) throws IOException {
        File s = pathToFile(src);
        if (!s.exists()) {
            return false;
        }
        File d = pathToFile(dst);
        if (d.exists()) {
            FileUtil.fullyDelete(d);
        }
        return FileUtil.copy(this, src, this, dst, true, getConf());
    }

    @Override
    public FSDataOutputStream create(
            Path f, FsPermission permission, boolean overwrite, int bufferSize,
            short replication, long blockSize, Progressable progress)
            throws IOException {
        if (overwrite) {
            return super.create(
                f, permission, true, bufferSize, replication, blockSize, progress);
        }
        final File dst = pathToFile(f);
        File parent = dst.getParentFile();
        if (parent != null) {
            parent.mkdirs();
        }
        final File tmp = File.createTempFile(".mocks3put", ".tmp", parent);
        final OutputStream buf = new FileOutputStream(tmp);
        OutputStream claimedAtClose = new OutputStream() {
            @Override
            public void write(int b) throws IOException {
                buf.write(b);
            }

            @Override
            public void write(byte[] b, int off, int len) throws IOException {
                buf.write(b, off, len);
            }

            @Override
            public void close() throws IOException {
                buf.close();
                try {
                    // link(2) creation is the atomic claim standing in
                    // for S3's conditional-PUT completion
                    java.nio.file.Files.createLink(dst.toPath(), tmp.toPath());
                } catch (java.nio.file.FileAlreadyExistsException e) {
                    tmp.delete();
                    throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                        f.toString());
                }
                tmp.delete();
            }
        };
        return new FSDataOutputStream(claimedAtClose, statistics);
    }
}
